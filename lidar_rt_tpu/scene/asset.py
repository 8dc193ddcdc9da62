"""GaussianAsset: one surfel cloud (background or actor) as a jit-stable pytree.

Equivalent of the reference's `GaussianModel` (lib/scene/gaussian_model.py:23)
redesigned for XLA: all arrays are padded to a fixed `capacity` with an
`alive` mask, so densify/prune/checkpoint never change traced shapes.  Raw
(pre-activation) parameters and their activations match the reference
(gaussian_model.py:25-56):

    scales   = exp(log_scale)          (2D surfel extents)
    opacity  = sigmoid(opacity_logit)
    rotation = normalize(quat)         (wxyz)
    sh       = concat(f_dc, f_rest)    per-channel SH coefficients

Dead (padding) slots hold neutral values — identity quaternion, opacity
logit -30 (sigmoid ~ 0, far below the 1/255 compositing threshold) — so a
composited render needs no special-casing of the mask.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.ops import knn as knn_lib

Array = jax.Array

DEAD_OPACITY_LOGIT = -30.0
DEAD_LOG_SCALE = -10.0


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaussianAsset:
    """Padded learnable surfel cloud.

    Leaves (all leading dim = capacity C):
      xyz           (C, 3)   positions in the asset's local frame
                             (world frame for the background; box frame for
                             actors — reference gaussian_model.py:129-134)
      f_dc          (C, 1, 3) degree-0 SH for (intensity, hit, drop)
      f_rest        (C, 15, 3) higher-degree SH
      log_scale     (C, 2)   raw 2D scales
      quat          (C, 4)   raw rotations, wxyz
      opacity_logit (C,)     raw opacities
      alive         (C,)     bool slot mask
      active_sh_degree ()    int32 — traced so the SH warm-up schedule
                             (train.py:134-135) causes no recompiles
    """

    xyz: Array
    f_dc: Array
    f_rest: Array
    log_scale: Array
    quat: Array
    opacity_logit: Array
    alive: Array
    active_sh_degree: Array
    # Static metadata.
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True), default=3)
    extent: float = dataclasses.field(metadata=dict(static=True), default=200.0)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    # Activations (reference gaussian_model.py:25-33,110-147).
    @property
    def scales(self) -> Array:
        # Clamped exp: a runaway log_scale otherwise underflows scale to 0,
        # whose inverse (the splat-frame uv transform) is inf and poisons
        # gradients with 0*inf = NaN.  [1e-6, 1e6] m never binds in healthy
        # training (the reference's unclamped exp has the same hazard).
        return jnp.exp(jnp.clip(self.log_scale, -13.8, 13.8))

    @property
    def opacity(self) -> Array:
        return jax.nn.sigmoid(self.opacity_logit)

    @property
    def rotation(self) -> Array:
        return quat_lib.normalize(self.quat)

    @property
    def sh(self) -> Array:
        """(..., 16, 3) — concat of DC + rest (gaussian_model.py:140-144).
        axis=-2 so the property also works on actor-batched assets."""
        return jnp.concatenate([self.f_dc, self.f_rest], axis=-2)

    def one_up_sh_degree(self) -> "GaussianAsset":
        """Grow the active SH degree by one, capped at max (train.py:134)."""
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(self.active_sh_degree + 1,
                                         self.max_sh_degree))

    def params(self) -> dict[str, Array]:
        """The learnable leaves, keyed by the reference's optimizer group
        names (gaussian_model.py:191-198) — the unit for per-group LRs and
        optimizer-state surgery."""
        return {
            "xyz": self.xyz,
            "f_dc": self.f_dc,
            "f_rest": self.f_rest,
            "opacity": self.opacity_logit,
            "scaling": self.log_scale,
            "rotation": self.quat,
        }

    def with_params(self, p: dict[str, Array]) -> "GaussianAsset":
        return dataclasses.replace(
            self, xyz=p["xyz"], f_dc=p["f_dc"], f_rest=p["f_rest"],
            opacity_logit=p["opacity"], log_scale=p["scaling"],
            quat=p["rotation"])


def dead_asset(capacity: int, max_sh_degree: int = 3,
               extent: float = 200.0) -> GaussianAsset:
    """An all-padding asset with neutral parameter values."""
    quat = jnp.zeros((capacity, 4)).at[:, 0].set(1.0)
    return GaussianAsset(
        xyz=jnp.zeros((capacity, 3)),
        f_dc=jnp.zeros((capacity, 1, 3)),
        f_rest=jnp.zeros((capacity, 15, 3)),
        log_scale=jnp.full((capacity, 2), DEAD_LOG_SCALE),
        quat=quat,
        opacity_logit=jnp.full((capacity,), DEAD_OPACITY_LOGIT),
        alive=jnp.zeros((capacity,), bool),
        active_sh_degree=jnp.asarray(0, jnp.int32),
        max_sh_degree=max_sh_degree,
        extent=extent,
    )


def from_points(points: Array, color: Array, key: Array, capacity: int,
                normals: Array | None = None, max_sh_degree: int = 3,
                extent: float = 200.0, init_opacity: float = 0.1
                ) -> GaussianAsset:
    """Initialize an asset from a seed point cloud.

    Mirrors `create_from_pcd` (reference gaussian_model.py:155-184):
      * DC SH = RGB2SH(color triplet), rest = 0
      * log_scale = log sqrt(clamp(mean 3-NN sq dist, 1e-7)), both axes
      * rotation: normal-aligned random in-plane spin when normals are given
        (general_utils.py:286-308), else random
      * opacity = inverse_sigmoid(0.1)

    points (N, 3), color (N, 3) with N <= capacity; extra slots are dead.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points > capacity {capacity}")
    points = jnp.asarray(points, jnp.float32)
    color = jnp.asarray(color, jnp.float32)

    d2 = jnp.clip(knn_lib.mean_sq_dist_to_3nn(points), 1e-7, None)
    log_scale = jnp.log(jnp.sqrt(d2))[:, None].repeat(2, axis=1)

    k_rot, k_rand = jax.random.split(key)
    if normals is not None:
        rots = quat_lib.random_with_fixed_normal(k_rot, jnp.asarray(normals))
    else:
        rots = jax.random.uniform(k_rand, (n, 4))

    base = dead_asset(capacity, max_sh_degree, extent)
    sl = slice(0, n)
    return dataclasses.replace(
        base,
        xyz=base.xyz.at[sl].set(points),
        f_dc=base.f_dc.at[sl].set(sh_lib.rgb_to_sh(color)[:, None, :]),
        log_scale=base.log_scale.at[sl].set(log_scale),
        quat=base.quat.at[sl].set(rots),
        opacity_logit=base.opacity_logit.at[sl].set(
            inverse_sigmoid(jnp.float32(init_opacity))),
        alive=base.alive.at[sl].set(True),
    )
