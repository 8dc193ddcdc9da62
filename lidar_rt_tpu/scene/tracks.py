"""Rigid actor tracks: per-frame SE(3) box poses for dynamic objects.

Equivalent of the reference's `BoundingBox` (lib/scene/bounding_box.py:8-72)
as dense arrays instead of a frame dict: every track stores a pose for every
frame index, with missing observations forward/backward-filled at build time
(reference lib/utils/general_utils.py:266-283).  Construction helpers cover
both dataset conventions:

  * Waymo: box center in ego frame + yaw -> world translation/quaternion
    (bounding_box.py:21-53)
  * KITTI-360: full 3x4 transform, SVD split into rotation + scale = size
    (bounding_box.py:55-72)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.core import transforms

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ActorTrack:
    """One actor's box geometry and trajectory (all frames dense).

    size:         (3,)   full box extents (x, y, z)
    translations: (F, 3) box center in world, per frame
    quats:        (F, 4) box orientation in world (wxyz), per frame
    present:      (F,)   bool — frame had a real observation (vs filled)
    """

    size: Array
    translations: Array
    quats: Array
    present: Array

    object_id: str = field(metadata=dict(static=True), default="")
    object_type: str = field(metadata=dict(static=True), default="vehicle")

    @property
    def num_frames(self) -> int:
        return self.translations.shape[0]

    @property
    def min_xyz(self) -> Array:
        return -self.size / 2.0

    @property
    def max_xyz(self) -> Array:
        return self.size / 2.0

    def pose(self, frame: Array) -> tuple[Array, Array]:
        """(translation (3,), quaternion (4,)) at a (traced) frame index."""
        return self.translations[frame], self.quats[frame]

    def mean_speed(self) -> Array:
        """Mean per-frame center displacement over observed frames — the
        reference's dynamic-actor gate is avg velocity > 0.01
        (gs_loader.py:58-76)."""
        d = jnp.linalg.norm(jnp.diff(self.translations, axis=0), axis=-1)
        both = self.present[1:] & self.present[:-1]
        return jnp.sum(d * both) / jnp.maximum(jnp.sum(both), 1)


class TrackBuilder:
    """Accumulates sparse per-frame observations, emits a dense ActorTrack."""

    def __init__(self, num_frames: int, size, object_id: str = "",
                 object_type: str = "vehicle"):
        self.num_frames = num_frames
        self.size = np.asarray(size, np.float32)
        self.object_id = object_id
        self.object_type = object_type
        self._t = np.zeros((num_frames, 3), np.float32)
        self._q = np.tile(np.array([1, 0, 0, 0], np.float32), (num_frames, 1))
        self._present = np.zeros((num_frames,), bool)

    def add_frame_waymo(self, frame: int, center_ego, yaw: float,
                        ego2world) -> None:
        """Ego-frame yaw box -> world pose (bounding_box.py:21-53)."""
        ego2world = np.asarray(ego2world, np.float32)
        center = ego2world[:3, :3] @ np.asarray(center_ego, np.float32) \
            + ego2world[:3, 3]
        c, s = np.cos(yaw), np.sin(yaw)
        r_yaw = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        r = ego2world[:3, :3] @ r_yaw
        q = np.asarray(quat_lib.from_rotation_matrix(jnp.asarray(r)))
        self._set(frame, center, q)

    def add_frame_kitti(self, frame: int, transform) -> None:
        """Full 3x4/4x4 obj2world; SVD splits rotation from size scaling
        (bounding_box.py:55-72; size grows to the max over frames)."""
        transform = np.asarray(transform, np.float32)
        u, s, _ = np.linalg.svd(transform[:3, :3])
        self.size = np.maximum(self.size, s.astype(np.float32))
        q = np.asarray(quat_lib.from_rotation_matrix(jnp.asarray(u)))
        self._set(frame, transform[:3, 3], q)

    def add_frame_pose(self, frame: int, translation, quat_wxyz) -> None:
        self._set(frame, np.asarray(translation, np.float32),
                  np.asarray(quat_wxyz, np.float32))

    def _set(self, frame: int, t, q) -> None:
        self._t[frame] = t
        self._q[frame] = q
        self._present[frame] = True

    def build(self) -> ActorTrack:
        t, q = transforms.forward_fill_poses(self._present, self._t, self._q)
        return ActorTrack(
            size=jnp.asarray(self.size),
            translations=jnp.asarray(t),
            quats=jnp.asarray(q),
            present=jnp.asarray(self._present),
            object_id=self.object_id,
            object_type=self.object_type,
        )


def stack_tracks(tracks: list[ActorTrack]) -> ActorTrack:
    """Stack M tracks into one batched ActorTrack with leading axis M."""
    return ActorTrack(
        size=jnp.stack([t.size for t in tracks]),
        translations=jnp.stack([t.translations for t in tracks]),
        quats=jnp.stack([t.quats for t in tracks]),
        present=jnp.stack([t.present for t in tracks]),
        object_id="|".join(t.object_id for t in tracks),
        object_type="|".join(t.object_type for t in tracks),
    )
