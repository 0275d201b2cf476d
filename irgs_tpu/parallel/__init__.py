from .dp import make_mesh, stage2_dp_step  # noqa: F401
