"""irgs_tpu — TPU-native inverse-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IRGS
("Inter-Reflective Gaussian Splatting with 2D Gaussian Ray Tracing",
CVPR 2025; reference implementation: PyTorch + CUDA/OptiX).

Layer map (bottom → top), mirroring the reference's structure but with
TPU-first architecture:

  ops/       — differentiable surfel rasterizer, surfel ray tracer, knn,
               cubemap filtering (≙ the reference CUDA submodules)
  scene/     — GaussianScene pytree, environment lights, cameras, datasets
  render/    — renderers: initial 2DGS, deferred stage-1, IRGS stage-2
               rendering equation
  train/     — losses, optimizers, stage-1/stage-2 training loops
  parallel/  — jax.sharding mesh helpers; multi-chip data/sample parallel
  eval/      — NVS / material / relighting metrics and scripts
"""

__version__ = "0.1.0"

import jax as _jax

# Inverse rendering has a ~0.1 dB PSNR parity budget (BASELINE.md): the
# default TPU matmul precision (bf16 inputs) costs ~1e-3 relative error in
# blend/transform matmuls, which is visible at that budget. All framework
# matmuls are small (3x3 transforms, [256,K]@[K,C] blends), so fp32 inputs
# are affordable; individual hot ops may opt back down after measurement.
_jax.config.update("jax_default_matmul_precision", "highest")

# Large jitted programs (rasterizer + tracer + AD) take minutes to compile on
# the TPU AOT path; cache them across processes.
import os as _os

_cache_dir = _os.environ.get(
    "IRGS_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".jax_cache"),
)
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # cache is an optimization, never a requirement
    pass

