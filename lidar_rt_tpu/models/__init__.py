"""Neural models: the ray-drop refinement U-Net."""

from lidar_rt_tpu.models.unet import RayDropUNet  # noqa: F401
