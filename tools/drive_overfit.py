"""Drive irgs_tpu's public API on the real TPU: render -> loss -> grad -> Adam."""
import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np, optax
import irgs_tpu  # public package import
from irgs_tpu.ops.surfel_raster import rasterize
from irgs_tpu.scene.cameras import Camera

print("devices:", jax.devices())

# scene: 2k random surfels, 128x128 image
key = jax.random.PRNGKey(0)
n = 2048
ks = jax.random.split(key, 6)
params = dict(
    means=jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1),
    scales=jnp.full((n, 2), -2.5),
    quats=jax.random.normal(ks[2], (n, 4)),
    opac=jnp.zeros((n, 1)),
    shs=jax.random.normal(ks[4], (n, 16, 3)) * 0.2,
)
feats = jax.random.uniform(ks[5], (n, 4))
cam = Camera(0, np.eye(3), np.array([0., 0., 4.]), 0.9, 0.9, image=None, width=128, height=128)
cp = cam.params()
bg = jnp.zeros(3)
off = jnp.zeros((n, 2))
kw = dict(img_w=128, img_h=128, active_sh_degree=3, dup_capacity=2**17)

# target: a smooth gradient image
yy, xx = jnp.meshgrid(jnp.linspace(0, 1, 128), jnp.linspace(0, 1, 128), indexing="ij")
tgt = jnp.stack([xx, yy, 0.5 * (xx + yy)], -1)

def loss_fn(p):
    out = rasterize(p["means"], jnp.exp(p["scales"]), p["quats"],
                    jax.nn.sigmoid(p["opac"]), p["shs"], feats, off, cp, bg, **kw)
    return jnp.abs(out.color - tgt).mean(), out

opt = optax.adam(5e-3)
state = opt.init(params)

@jax.jit
def step(p, s):
    (l, out), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    up, s = opt.update(g, s)
    return optax.apply_updates(p, up), s, l, out

t0 = time.time()
p = params
for i in range(201):
    p, state, l, out = step(p, state)
    if i in (0, 50, 100, 200):
        mse = jnp.mean((out.color - tgt) ** 2)
        psnr = -10 * jnp.log10(mse)
        print(f"iter {i:4d}  L1 {float(l):.4f}  PSNR {float(psnr):.2f} dB  overflow {int(out.overflow)}")
print(f"wall: {time.time()-t0:.1f}s (incl. compile); per-step after warmup:")
t0 = time.time()
for _ in range(50):
    p, state, l, out = step(p, state)
jax.block_until_ready(l)
print(f"  {(time.time()-t0)/50*1000:.1f} ms/step @128x128, n=2048 on {jax.devices()[0].device_kind}")

# probe 1: capacity overflow is reported, not silent corruption
out_small = rasterize(p["means"], jnp.exp(p["scales"]), p["quats"],
                      jax.nn.sigmoid(p["opac"]), p["shs"], feats, off, cp, bg,
                      img_w=128, img_h=128, active_sh_degree=3, dup_capacity=2**10)
print("probe overflow (tiny capacity):", int(out_small.overflow), "dropped dups; color finite:",
      bool(jnp.isfinite(out_small.color).all()))

# probe 2: all-dead mask renders pure background
out_dead = rasterize(p["means"], jnp.exp(p["scales"]), p["quats"],
                     jax.nn.sigmoid(p["opac"]), p["shs"], feats, off, cp,
                     jnp.array([1., 0., 0.]), alive=jnp.zeros(n, bool), **kw)
print("probe dead-mask: max|color - bg| =", float(jnp.abs(out_dead.color - jnp.array([1., 0., 0.])).max()))
