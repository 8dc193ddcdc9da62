"""Scene assembly: sensor frames + actor tracks -> initialized Scene.

Equivalent of the reference's `SceneLidar.__init__` (lib/dataloader/
gs_loader.py:16-218): back-project every frame to world points, estimate
normals, carve dynamic-actor points into box-local frames, voxel-downsample
the background, pad actors to a fixed point count with random-in-box
samples, then initialize `GaussianAsset`s.  Replacements for the reference's
GPU/Open3D dependencies:

  * o3d.estimate_normals(knn=6)   -> ops/knn.estimate_normals (Morton PCA)
  * o3d.voxel_down_sample(0.15)   -> numpy unique-voxel averaging
  * simple-knn distCUDA2          -> ops/knn.mean_sq_dist_to_3nn
    (inside GaussianAsset.from_points)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.ops import knn as knn_lib
from lidar_rt_tpu.scene import (GaussianAsset, Scene, from_points,
                                stack_tracks)
from lidar_rt_tpu.scene.tracks import ActorTrack

DYNAMIC_SPEED_THRESHOLD = 0.01  # gs_loader.py:64 (mean displacement/frame)

_NORMAL_PAD_BUCKET = 32768


def _estimate_normals_padded(pts: np.ndarray, center: np.ndarray
                             ) -> np.ndarray:
    """estimate_normals with the input padded to a bucket size so every
    frame reuses one compiled program (frames have varying point counts —
    without padding each frame would trigger a fresh XLA compile)."""
    n = pts.shape[0]
    padded = -(-max(n, 1) // _NORMAL_PAD_BUCKET) * _NORMAL_PAD_BUCKET
    if padded != n:
        # far-away fillers can't enter any real point's kNN neighbourhood
        filler = np.full((padded - n, 3), 1e7, np.float32)
        filler += np.arange(padded - n, dtype=np.float32)[:, None]
        pts = np.concatenate([pts, filler], axis=0)
    out = np.asarray(knn_lib.estimate_normals(
        jnp.asarray(pts), jnp.asarray(center), k=6))
    return out[:n]


def voxel_downsample(points: np.ndarray, attrs: list[np.ndarray],
                     voxel_size: float
                     ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Average points (and attached attributes) per occupied voxel —
    o3d.voxel_down_sample equivalent (gs_loader.py:125-143)."""
    ids = np.floor(points / voxel_size).astype(np.int64)
    _, inverse, counts = np.unique(ids, axis=0, return_inverse=True,
                                   return_counts=True)
    n_vox = counts.shape[0]

    def seg_mean(x):
        out = np.zeros((n_vox,) + x.shape[1:], np.float64)
        np.add.at(out, inverse, x)
        return (out / counts.reshape(-1, *([1] * (x.ndim - 1)))).astype(
            np.float32)

    return seg_mean(points), [seg_mean(a) for a in attrs]


def round_capacity(n: int, headroom: float, multiple: int = 1024) -> int:
    """Padded capacity: n * headroom rounded up to a lane-friendly multiple,
    never below n itself."""
    target = max(n, int(n * max(headroom, 1.0)))
    return max(multiple, -(-target // multiple) * multiple)


def select_dynamic_tracks(tracks: list[ActorTrack]) -> list[ActorTrack]:
    """Actors worth modeling: moving vehicles (gs_loader.py:58-76)."""
    return [t for t in tracks
            if float(t.mean_speed()) > DYNAMIC_SPEED_THRESHOLD
            and t.object_type in ("vehicle", "1", "car", "truck", "bus")]


def assemble_scene(frames: LiDARFrames, tracks: list[ActorTrack] | None,
                   args, key: jax.Array | None = None,
                   capacity_headroom: float = 4.0) -> Scene:
    """Build the initialized Scene from loaded data.

    args: config Args with `model.*` and `opt.use_normal_init` /
    `opt.use_voxel_init` (configs/exp.yaml:12-18,45-46).
    """
    key = key if key is not None else jax.random.key(0)
    model = args.model
    use_normals = bool(args.opt.use_normal_init)

    dynamic = select_dynamic_tracks(tracks or [])

    bg_pts, bg_int, bg_nrm = [], [], []
    actor_data = [([], [], []) for _ in dynamic]

    frame_list = range(frames.num_frames)
    for f in frame_list:
        pts, inten = frames.inverse_projection(f)
        center = np.asarray(frames.sensor_center(f))
        nrm = _estimate_normals_padded(pts, center) if use_normals \
            else np.zeros_like(pts)

        keep = np.ones(pts.shape[0], bool)
        for a, track in enumerate(dynamic):
            t_box = np.asarray(track.translations[f])
            from lidar_rt_tpu.core import quaternions as quat_lib
            r_box = np.asarray(quat_lib.to_rotation_matrix(track.quats[f]))
            local = (pts - t_box) @ r_box          # = R^T (x - T)
            inside = (np.abs(local)
                      < np.asarray(track.size) / 2.0).all(axis=1)
            actor_data[a][0].append(local[inside])
            actor_data[a][1].append(inten[inside])
            actor_data[a][2].append(nrm[inside] @ r_box)
            keep &= ~inside
        bg_pts.append(pts[keep])
        bg_int.append(inten[keep])
        bg_nrm.append(nrm[keep])

    pts = np.concatenate(bg_pts, axis=0)
    inten = np.concatenate(bg_int, axis=0)
    nrm = np.concatenate(bg_nrm, axis=0)

    # Init color triplet: (intensity, hit=1, drop=0) (gs_loader.py:121-123).
    color = np.stack([inten, np.ones_like(inten), np.zeros_like(inten)],
                     axis=1)

    if bool(args.opt.use_voxel_init):
        pts, (color, nrm) = voxel_downsample(pts, [color, nrm],
                                             float(model.voxel_size))
    else:
        rng = np.random.default_rng(0)
        n_keep = max(1, pts.shape[0] // max(1, frames.num_frames) * 5)
        sel = rng.permutation(pts.shape[0])[:n_keep]
        pts, color, nrm = pts[sel], color[sel], nrm[sel]

    # Scene extent: 90th percentile diameter x factor (gs_loader.py:151-157).
    center = pts.mean(axis=0)
    diam = 2.0 * np.linalg.norm(pts - center, axis=1)
    extent = float(model.bkgd_extent_factor) * float(np.quantile(diam, 0.90))

    key, k_bg = jax.random.split(key)
    background = from_points(
        jnp.asarray(pts), jnp.asarray(color), k_bg,
        capacity=round_capacity(pts.shape[0], capacity_headroom),
        normals=jnp.asarray(nrm) if use_normals else None,
        max_sh_degree=int(model.sh_degree), extent=extent)

    if not dynamic:
        return Scene(background=background)

    # Actors: pad/sample to obj_pt_num (gs_loader.py:164-209).
    obj_pt_num = int(model.obj_pt_num)
    actor_assets: list[GaussianAsset] = []
    rng = np.random.default_rng(1)
    for a, track in enumerate(dynamic):
        a_pts = np.concatenate(actor_data[a][0], axis=0).astype(np.float32)
        a_int = np.concatenate(actor_data[a][1], axis=0).astype(np.float32)
        a_nrm = np.concatenate(actor_data[a][2], axis=0).astype(np.float32)
        size = np.asarray(track.size)
        if a_pts.shape[0] < obj_pt_num:
            extra = obj_pt_num - a_pts.shape[0]
            extra_pts = rng.uniform(size=(extra, 3)).astype(np.float32) \
                * size - size / 2.0
            extra_int = rng.uniform(size=(extra,)).astype(np.float32)
            theta = rng.uniform(0, 2 * np.pi, extra)
            phi = rng.uniform(0, np.pi, extra)
            extra_nrm = np.stack([np.sin(phi) * np.cos(theta),
                                  np.sin(phi) * np.sin(theta),
                                  np.cos(phi)], axis=1).astype(np.float32)
            a_pts = np.concatenate([a_pts, extra_pts])
            a_int = np.concatenate([a_int, extra_int])
            a_nrm = np.concatenate([a_nrm, extra_nrm])
        elif a_pts.shape[0] > obj_pt_num:
            sel = rng.permutation(a_pts.shape[0])[:obj_pt_num]
            a_pts, a_int, a_nrm = a_pts[sel], a_int[sel], a_nrm[sel]

        a_color = np.stack([a_int, np.ones_like(a_int),
                            np.zeros_like(a_int)], axis=1)
        a_extent = float(np.linalg.norm(size)) \
            * float(model.object_extent_factor)
        key, k_a = jax.random.split(key)
        actor_assets.append(from_points(
            jnp.asarray(a_pts), jnp.asarray(a_color), k_a,
            capacity=round_capacity(obj_pt_num, capacity_headroom / 2.0),
            normals=jnp.asarray(a_nrm) if use_normals else None,
            max_sh_degree=int(model.sh_degree), extent=a_extent))

    # Stack actors (same capacity by construction).  Static metadata must be
    # uniform to stack the pytrees: take the max extent (the per-actor box
    # geometry that matters for rendering lives in the tracks).
    max_extent = max(a.extent for a in actor_assets)
    actor_assets = [dataclasses.replace(a, extent=max_extent)
                    for a in actor_assets]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *actor_assets)
    return Scene(background=background, actors=stacked,
                 tracks=stack_tracks(dynamic))
