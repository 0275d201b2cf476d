from .cameras import Camera, CameraParams  # noqa: F401
