"""Focused A/B: Pallas DMA row-gather vs XLA gather at the tiled select's
shipping shape (width 14*TILE=224 f32, R*select_tiles rows). CHAINED timing
(axon memoizes repeated dispatches; block_until_ready does not sync).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from irgs_tpu.ops.gather_pallas import gather_rows

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)


def bench_chain(step, state0, n=8):
    s = step(state0)
    np.asarray(jax.tree.leaves(s)[0])[...]
    t0 = time.time()
    for _ in range(n):
        s = step(s)
    for leaf in jax.tree.leaves(s):
        np.asarray(leaf.ravel()[0])
    return (time.time() - t0) / n


N = 2 ** 17
W = 224
ROWS = 2 ** 18
kt, ki = jax.random.split(key)
table = jax.random.normal(kt, (N, W), jnp.float32)
idx0 = jax.random.randint(ki, (ROWS,), 0, N)


@jax.jit
def step_xla(idx):
    s = jnp.sum(table[idx], axis=-1)
    return (idx + (s > 0).astype(jnp.int32)) % N


dt = bench_chain(step_xla, idx0)
print(f"XLA    w={W} rows={ROWS}: {dt*1e3:7.2f} ms  {ROWS/dt/1e6:7.2f} Mrows/s"
      f"  {ROWS*W*4/1e9/dt:6.1f} GB/s", flush=True)

for infl, br in ((8, 256), (16, 512), (32, 1024), (64, 2048)):
    @jax.jit
    def step_pl(idx, infl=infl, br=br):
        s = jnp.sum(gather_rows(table, idx, block_rows=br, inflight=infl),
                    axis=-1)
        return (idx + (s > 0).astype(jnp.int32)) % N

    try:
        dt = bench_chain(step_pl, idx0)
    except Exception as e:  # noqa: BLE001
        print(f"PALLAS infl={infl} br={br}: FAILED {type(e).__name__}: {e}",
              flush=True)
        continue
    print(f"PALLAS w={W} rows={ROWS} infl={infl:2d} br={br:4d}: "
          f"{dt*1e3:7.2f} ms  {ROWS/dt/1e6:7.2f} Mrows/s  "
          f"{ROWS*W*4/1e9/dt:6.1f} GB/s", flush=True)
