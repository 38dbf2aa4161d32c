from .config import CameraConfig, Config
from . import camera, pose, transforms

__all__ = ["CameraConfig", "Config", "camera", "pose", "transforms"]
