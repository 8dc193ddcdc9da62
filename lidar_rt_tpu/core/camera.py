"""Pinhole camera: debug rendering of surfel scenes from camera views.

Equivalent of the reference's Camera/MiniCam (lib/scene/cameras.py:16-61)
and its camera branch in `raytracing()` (lib/gaussian_renderer/
__init__.py:31-41), used for synthetic-view sanity checks of a LiDAR
scene.  Camera rays are unstructured w.r.t. the spherical raster, so the
render path here is the dense oracle (ops/composite.py), chunked over
pixels — a debugging tool, not a hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.ops import composite

Array = jax.Array


@dataclass(frozen=True)
class Camera:
    """R: (3, 3) world->camera rotation; T: (3,) translation (the
    reference's COLMAP-style convention, cameras.py:16-47)."""

    image_height: int
    image_width: int
    fovx: float
    fovy: float
    r: np.ndarray
    t: np.ndarray
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def world_view_transform(self) -> np.ndarray:
        return transforms.world_to_view(self.r, self.t)

    @property
    def projection_matrix(self) -> np.ndarray:
        return transforms.projection_matrix(self.znear, self.zfar,
                                            self.fovx, self.fovy)

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.world_view_transform)[:3, 3]

    def rays(self) -> tuple[Array, Array]:
        """(origin (3,), dirs (H, W, 3)) world-frame pinhole rays
        (reference graphics_utils.py:88-95)."""
        h, w = self.image_height, self.image_width
        tan_x = np.tan(self.fovx / 2.0)
        tan_y = np.tan(self.fovy / 2.0)
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w * 2.0 - 1.0
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h * 2.0 - 1.0
        dx, dy = np.meshgrid(xs * tan_x, ys * tan_y)
        d_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1)
        c2w = np.linalg.inv(self.world_view_transform)
        d_world = d_cam @ c2w[:3, :3].T
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        return jnp.asarray(self.camera_center), jnp.asarray(d_world)


def render_debug(bundle: composite.SurfelBundle, camera: Camera,
                 background: Array | None = None, active_sh_degree=3,
                 chunk: int = 8192) -> dict[str, Array]:
    """Render a camera view of the surfel scene via the dense oracle.

    Returns intensity/depth/accum images (H, W).  O(pixels x N) — meant
    for small debug views of subsampled scenes."""
    bg = background if background is not None else jnp.zeros(3)
    origin, dirs = camera.rays()
    flat = dirs.reshape(-1, 3)
    outs = []
    n_pix = flat.shape[0]
    pad = -(-n_pix // chunk) * chunk - n_pix
    flat = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=1.0)
    for start in range(0, flat.shape[0], chunk):
        out = composite.render_dense(bundle, origin,
                                     flat[start:start + chunk], bg,
                                     active_sh_degree)
        outs.append(out.channels)
    ch = jnp.concatenate(outs, axis=0)[:n_pix].reshape(
        camera.image_height, camera.image_width, 9)
    return {"intensity": ch[..., 0], "depth": ch[..., 3],
            "accum": ch[..., 4], "channels": ch}
