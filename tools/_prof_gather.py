"""Microbenchmark: row-gather throughput vs row width, and lax.sort rates.

CHAINED timing: the axon backend memoizes repeated executions and
block_until_ready does not synchronize, so each iteration's input is derived
from the previous output and a final host fetch closes the chain.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
key = jax.random.PRNGKey(0)


def bench_chain(step, state0, n=8):
    """step: state -> state (jitted). Times n chained steps."""
    s = step(state0)
    np.asarray(jax.tree.leaves(s)[0])[...]  # force materialization (warm)
    t0 = time.time()
    for _ in range(n):
        s = step(s)
    # fetch a scalar from every leaf to force the whole chain
    for leaf in jax.tree.leaves(s):
        np.asarray(leaf.ravel()[0])
    return (time.time() - t0) / n


N = 2 ** 17
for width in (13, 32, 64, 128, 256, 512, 1024, 2048):
    kt, ki = jax.random.split(jax.random.fold_in(key, width))
    table = jax.random.normal(kt, (N, width), jnp.float32)
    for rows in (2 ** 16, 2 ** 18):
        if rows * width > 2 ** 27:
            continue
        idx0 = jax.random.randint(ki, (rows,), 0, N)

        @jax.jit
        def step(idx, table=table):
            rows_g = table[idx]                      # the gather under test
            s = jnp.sum(rows_g, axis=-1)             # [rows]
            # derive next idx from the gathered data (forces execution)
            return (idx + (s > 0).astype(jnp.int32)) % N

        dt = bench_chain(step, idx0)
        gb = rows * width * 4 / 1e9
        print(f"row gather w={width:5d} rows={rows:7d}: {dt*1e3:7.2f} ms  "
              f"{rows/dt/1e6:8.2f} Mrows/s  {gb/dt:7.2f} GB/s", flush=True)

for rows in (2 ** 21, 2 ** 23):
    flat = jax.random.normal(key, (N * 13,), jnp.float32)
    idx0 = jax.random.randint(key, (rows,), 0, N * 13)

    @jax.jit
    def step(idx, flat=flat):
        v = flat[idx]
        return (idx + (v > 0).astype(jnp.int32)) % (N * 13)

    dt = bench_chain(step, idx0)
    print(f"elem gather n={rows:8d}: {dt*1e3:7.2f} ms  {rows/dt/1e6:8.2f} Melem/s",
          flush=True)

for (R, S, nops) in ((8192, 72, 2), (8192, 72, 5), (8192, 256, 3),
                     (8192, 768, 2), (65536, 72, 5)):
    k0 = jax.random.fold_in(key, R * S + nops)
    x0 = jax.random.normal(k0, (R, S), jnp.float32)
    pays = [jax.random.randint(k0, (R, S), 0, 1 << 20, jnp.int32)
            for _ in range(nops - 1)]

    @jax.jit
    def step(x, pays=tuple(pays)):
        out = jax.lax.sort((x,) + pays, num_keys=1, dimension=-1,
                           is_stable=False)[0]
        return out[:, ::-1] * 0.999 + 1e-4   # permuted + perturbed -> next key

    dt = bench_chain(step, x0)
    print(f"sort [{R},{S}] x{nops}: {dt*1e3:7.2f} ms  "
          f"{R*S/dt/1e6:8.1f} Melem/s", flush=True)

R, C, J = 8192, 24, 32
d0 = jax.random.normal(key, (R, C, J))
L0 = -jnp.abs(jax.random.normal(key, (R, C, J))) * 0.1

@jax.jit
def step(d):
    lt = (d[..., :, None] > d[..., None, :])
    Tw = jnp.sum(jnp.where(lt, L0[..., None, :], 0.0), axis=-1)
    cum = jnp.cumsum(L0.reshape(R, C * J), axis=-1).reshape(R, C, J)
    out = Tw + cum
    return d * 0.999 + out * 1e-6

dt = bench_chain(step, d0)
print(f"pairwise+cumsum [R={R},C={C},J={J}]: {dt*1e3:7.2f} ms", flush=True)

# matmul sanity anchor
a0 = jax.random.normal(key, (4096, 4096), jnp.float32)
b0 = jax.random.normal(key, (4096, 4096), jnp.float32)

@jax.jit
def step(a):
    c = a @ b0
    return c * (1.0 / jnp.maximum(1e-6, jnp.max(jnp.abs(c))))

dt = bench_chain(step, a0)
print(f"matmul 4096^3 f32 (+norm): {dt*1e3:.2f} ms {2*4096**3/dt/1e12:.1f} TFLOP/s",
      flush=True)

# Pallas DMA row-gather (ops/gather_pallas.py) vs XLA gather, at the tiled
# select's shipping shapes: 14*TILE-float rows (TILE=16 -> width 224),
# rows = R * select_tiles.
from irgs_tpu.ops.gather_pallas import gather_rows

for width in (224, 896):
    kt, ki = jax.random.split(jax.random.fold_in(key, 9000 + width))
    table = jax.random.normal(kt, (N, width), jnp.float32)
    for rows in (2 ** 16, 2 ** 18):
        if rows * width > 2 ** 27:
            continue
        idx0 = jax.random.randint(ki, (rows,), 0, N)

        @jax.jit
        def step_xla(idx, table=table):
            s = jnp.sum(table[idx], axis=-1)
            return (idx + (s > 0).astype(jnp.int32)) % N

        dt = bench_chain(step_xla, idx0)
        print(f"XLA    row gather w={width:4d} rows={rows:7d}: {dt*1e3:7.2f} ms "
              f"{rows/dt/1e6:8.2f} Mrows/s  {rows*width*4/1e9/dt:7.2f} GB/s",
              flush=True)

        for infl in (4, 8, 16, 32):
            for br in (256, 1024):
                @jax.jit
                def step_pl(idx, table=table, infl=infl, br=br):
                    s = jnp.sum(gather_rows(table, idx, block_rows=br,
                                            inflight=infl), axis=-1)
                    return (idx + (s > 0).astype(jnp.int32)) % N

                try:
                    dt = bench_chain(step_pl, idx0)
                except Exception as e:  # noqa: BLE001
                    print(f"pallas gather w={width} rows={rows} infl={infl} "
                          f"br={br}: FAILED {type(e).__name__}", flush=True)
                    continue
                print(f"PALLAS row gather w={width:4d} rows={rows:7d} "
                      f"infl={infl:2d} br={br:4d}: {dt*1e3:7.2f} ms "
                      f"{rows/dt/1e6:8.2f} Mrows/s  "
                      f"{rows*width*4/1e9/dt:7.2f} GB/s", flush=True)
