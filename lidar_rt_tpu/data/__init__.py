"""Data layer: sensor frame containers, dataset loaders, scene assembly.

- frames:    LiDARFrames — range images + poses + SensorGrid (host-side)
- synthetic: procedurally generated scenes with analytic ground truth
- kitti:     KITTI-360 velodyne/bbox/pose loader (numpy, no cv2 dependency)
- waymo:     Waymo TFRecord loader (pure-python protobuf wire parsing, no TF)
- build:     point-cloud scene assembly (SceneLidar equivalent)
"""

from lidar_rt_tpu.data.frames import LiDARFrames  # noqa: F401
