"""Scene = background surfel cloud + rigid dynamic actors, composed per frame.

Equivalent of the reference's `SceneLidar` + the per-frame asset concat and
quaternion pose composition inside `raytracing()` (reference
lib/dataloader/gs_loader.py:16-298, lib/gaussian_renderer/__init__.py:69-130),
restructured for XLA: actors are *stacked* into one batched `GaussianAsset`
(leading axis M, identical capacity per actor) so pose composition is a
vmapped tensor op and the flattened world-frame bundle has a static shape
`B + M*A` regardless of per-actor alive counts.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.ops.composite import SurfelBundle
from lidar_rt_tpu.scene.asset import GaussianAsset
from lidar_rt_tpu.scene.tracks import ActorTrack

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scene:
    """background: plain GaussianAsset (world-frame local coords).
    actors/tracks: batched with leading axis M (None when the scene is
    static).  Frame indices are positions in the loaded frame list."""

    background: GaussianAsset
    actors: GaussianAsset | None = None
    tracks: ActorTrack | None = None

    @property
    def num_actors(self) -> int:
        return 0 if self.actors is None else self.actors.xyz.shape[0]

    @property
    def total_capacity(self) -> int:
        cap = self.background.capacity
        if self.actors is not None:
            cap += self.actors.xyz.shape[0] * self.actors.xyz.shape[1]
        return cap

    def assets(self) -> list[GaussianAsset]:
        """Background first, then each actor — the reference's asset order
        (gs_loader.py:220-241 stores [background, *objects])."""
        out = [self.background]
        for i in range(self.num_actors):
            out.append(jax.tree.map(lambda x: x[i], self.actors))
        return out

    def one_up_sh_degree(self) -> "Scene":
        return dataclasses.replace(
            self,
            background=self.background.one_up_sh_degree(),
            actors=None if self.actors is None
            else self.actors.one_up_sh_degree(),
        )


def _actor_world(actors: GaussianAsset, tracks: ActorTrack, frame: Array
                 ) -> tuple[Array, Array]:
    """World positions and composed rotations for all actors at `frame`.

    xyz_world = xyz_local @ R_box^T + T_box      (gaussian_model.py:129-134)
    q_world   = q_box * normalize(q_local)       (renderer __init__.py:117-130)
    Returns ((M, A, 3), (M, A, 4)).
    """
    t_box = tracks.translations[:, frame]            # (M, 3)
    q_box = tracks.quats[:, frame]                   # (M, 4)
    r_box = quat_lib.to_rotation_matrix(q_box)       # (M, 3, 3)
    xyz_world = jnp.einsum("mij,maj->mai", r_box, actors.xyz,
                           precision=jax.lax.Precision.HIGHEST) \
        + t_box[:, None, :]
    q_world = quat_lib.multiply(q_box[:, None, :],
                                quat_lib.normalize(actors.quat))
    return xyz_world, q_world


def compose(scene: Scene, frame: Array, decomp: str | None = None
            ) -> tuple[SurfelBundle, Array]:
    """Flatten the scene at a frame into a world-frame render bundle.

    Returns (bundle, alive): bundle fields have leading dim B + M*A with
    background slots first; `alive` masks real splats.  Dead slots carry
    opacity 0 so they are compositing no-ops without branching.

    decomp: None renders everything; "background" / "object" zero out the
    other subset's opacities (shape-stable equivalent of the reference's
    decomposed rendering, lib/gaussian_renderer/__init__.py:26-29).
    """
    bg = scene.background
    bg_gate = 0.0 if decomp == "object" else 1.0
    ac_gate = 0.0 if decomp == "background" else 1.0
    means = [bg.xyz]
    quats = [bg.rotation]
    scales = [bg.scales]
    opac = [jnp.where(bg.alive, bg.opacity * bg_gate, 0.0)]
    shs = [bg.sh]
    alive = [bg.alive]

    if scene.actors is not None:
        ac = scene.actors
        xyz_w, q_w = _actor_world(ac, scene.tracks, frame)
        m, a = ac.xyz.shape[:2]
        means.append(xyz_w.reshape(m * a, 3))
        quats.append(q_w.reshape(m * a, 4))
        scales.append(ac.scales.reshape(m * a, 2))
        opac.append(jnp.where(ac.alive, ac.opacity * ac_gate,
                              0.0).reshape(m * a))
        shs.append(ac.sh.reshape(m * a, 16, 3))
        alive.append(ac.alive.reshape(m * a))

    bundle = SurfelBundle(
        means=jnp.concatenate(means, axis=0),
        rotations=jnp.concatenate(quats, axis=0),
        scales=jnp.concatenate(scales, axis=0),
        opacities=jnp.concatenate(opac, axis=0),
        sh=jnp.concatenate(shs, axis=0),
    )
    return bundle, jnp.concatenate(alive, axis=0)


def split_by_asset(scene: Scene, flat: Array) -> list[Array]:
    """Split a per-splat flat array (B + M*A, ...) back into per-asset views
    ordered like `assets()` — used to route tracer grads/weights to each
    asset's densification stats (reference gs_loader.py:253-270)."""
    sizes = [scene.background.capacity]
    if scene.actors is not None:
        m, a = scene.actors.xyz.shape[:2]
        sizes.extend([a] * m)
    out = []
    offset = 0
    for s in sizes:
        out.append(flat[offset:offset + s])
        offset += s
    return out
