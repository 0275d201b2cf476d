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

def _host_tag() -> str:
    """Fingerprint the host CPU features. XLA:CPU AOT artifacts embed the
    compile machine's ISA (AMX/AVX512 etc.); loading one on a host without
    those features SIGSEGVs inside backend_compile_and_load (observed: a
    round-4 judge segfault and a round-5 test-suite segfault, both from a
    cache dir shared across re-provisioned machines). Scoping the cache
    path by feature hash costs one recompile per machine change."""
    import hashlib as _hashlib
    try:
        with open("/proc/cpuinfo") as _f:
            flags = next((l for l in _f if l.startswith("flags")), "")
    except OSError:
        import platform as _platform
        flags = _platform.processor()
    return _hashlib.md5(flags.encode()).hexdigest()[:8]


_cache_dir = _os.environ.get(
    "IRGS_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache", _host_tag()),
)
# IRGS_TPU_COMPILE_CACHE="" disables the persistent cache entirely (the
# CPU test suite does this: XLA:CPU AOT (de)serialization has segfaulted
# on this image — see tests/conftest.py)
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # cache is an optimization, never a requirement
        pass

