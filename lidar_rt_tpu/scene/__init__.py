"""Scene state layer: padded surfel assets, actor tracks, frame composition.

All scene state is jit-stable pytrees with fixed capacities and alive masks
(the reference's variable-count torch tensors + optimizer surgery,
lib/scene/gaussian_model.py, become masked updates here).
"""

from lidar_rt_tpu.scene.asset import GaussianAsset, dead_asset, from_points  # noqa: F401
from lidar_rt_tpu.scene.scene import Scene, compose, split_by_asset  # noqa: F401
from lidar_rt_tpu.scene.tracks import ActorTrack, TrackBuilder, stack_tracks  # noqa: F401
