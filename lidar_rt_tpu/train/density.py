"""Adaptive density control: clone / split / prune inside a fixed capacity.

Equivalent of the reference's densification machinery
(lib/scene/gaussian_model.py:311-411 + optimizer-state surgery :220-308),
re-expressed for XLA's static shapes: instead of concatenating/pruning
tensors, every asset owns `capacity` slots with an alive mask, and one jitted
pass per densification interval
  1. marks sources to clone (small, high view-space gradient) and split
     (large, high gradient; the source is removed),
  2. marks prune victims (low opacity / oversized / outside the actor box),
  3. compacts children into free slots with prefix-sum allocation
     (`jnp.nonzero(size=C)` stream compaction — the moral equivalent of the
     reference's tensor concat), and
  4. zeroes the Adam moments of every written or killed slot — exactly the
     reference's `cat_tensors_to_optimizer` / `_prune_optimizer` surgery,
     but as masked scatters on the optax moment pytrees.

Children that don't fit in the remaining free slots are dropped (the
returned counts expose this so the driver can warn / grow capacity at the
next re-jit boundary).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from lidar_rt_tpu.core import quaternions as quat_lib
from lidar_rt_tpu.scene.asset import (DEAD_LOG_SCALE, DEAD_OPACITY_LOGIT,
                                      GaussianAsset, inverse_sigmoid)
from lidar_rt_tpu.scene.tracks import ActorTrack

Array = jax.Array

SPLIT_N = 2            # children per split (gaussian_model.py:311)
SPLIT_SHRINK = 0.8     # child scale = scale / (0.8 * N) (:329)


class DensifyStats(NamedTuple):
    """Running view-space gradient statistics (gaussian_model.py:409-411)."""

    grad_accum: Array   # (C,) sum of ||d loss / d world-mean||
    denom: Array        # (C,) number of iterations the splat was visible

    @staticmethod
    def zero(capacity: int) -> "DensifyStats":
        return DensifyStats(jnp.zeros((capacity,)), jnp.zeros((capacity,)))

    def add(self, world_mean_grads: Array, visible: Array) -> "DensifyStats":
        """grad_accum += ||grads|| (unconditional, as in the reference);
        denom += visible (accum weight > 0, train.py:218-219)."""
        return DensifyStats(
            self.grad_accum + jnp.linalg.norm(world_mean_grads, axis=-1),
            self.denom + visible.astype(self.denom.dtype))


class DensifyCounts(NamedTuple):
    cloned: Array
    split: Array
    pruned: Array
    dropped: Array      # children that found no free slot
    alive: Array


def _compact(mask: Array) -> Array:
    """Indices of True entries, padded with C (out-of-range sentinel)."""
    c = mask.shape[0]
    return jnp.nonzero(mask, size=c, fill_value=c)[0]


def _dead_fill(asset: GaussianAsset, kill: Array) -> GaussianAsset:
    """Reset killed slots to neutral padding values."""
    k1 = kill[:, None]
    return dataclasses.replace(
        asset,
        alive=asset.alive & ~kill,
        opacity_logit=jnp.where(kill, DEAD_OPACITY_LOGIT, asset.opacity_logit),
        log_scale=jnp.where(k1, DEAD_LOG_SCALE, asset.log_scale),
        quat=jnp.where(k1, jnp.array([1.0, 0.0, 0.0, 0.0]), asset.quat),
    )


def _zero_moments_at(opt_state, slots: Array, valid: Array):
    """Zero Adam mu/nu rows `slots[valid]` for every param group.

    optax.multi_transform state holds per-group ScaleByAdamState pytrees
    whose leaves are shaped like the params (C, ...).  Writing zeros at freed
    or newly spawned rows reproduces the reference's replace/cat surgery
    (gaussian_model.py:220-308).
    """
    targets = jnp.where(valid, slots, slots.shape[0])

    def zero_rows(leaf):
        if not isinstance(leaf, jnp.ndarray) or leaf.ndim == 0 \
                or leaf.shape[0] != valid.shape[0]:
            return leaf
        return leaf.at[targets].set(0.0, mode="drop")

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=node.count,
                mu=jax.tree.map(zero_rows, node.mu),
                nu=jax.tree.map(zero_rows, node.nu))
        return node

    return jax.tree.map(
        visit, opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))


def densify_and_prune(asset: GaussianAsset, opt_state, stats: DensifyStats,
                      key: Array, *, grad_threshold: float,
                      scale_threshold: float, opacity_threshold: float,
                      prune_size_threshold: float | None,
                      track: ActorTrack | None = None
                      ) -> tuple[GaussianAsset, object, DensifyStats,
                                 DensifyCounts]:
    """One clone+split+prune pass (gaussian_model.py:358-407).

    grad_threshold:        opt.densify_grad_threshold
    scale_threshold:       opt.densify_scale_threshold * extent — the
                           clone/split size boundary (:317-318, :345-346)
    opacity_threshold:     opt.thresh_opa_prune
    prune_size_threshold:  opt.prune_size_threshold (None disables the
                           world-size + box prune, reference's
                           `max_screen_size` gate :363)
    """
    c = asset.capacity
    mean_grads = jnp.where(stats.denom > 0,
                           stats.grad_accum / jnp.maximum(stats.denom, 1.0),
                           0.0)
    high_grad = (mean_grads >= grad_threshold) & asset.alive
    max_scale = jnp.max(asset.scales, axis=-1)
    clone_mask = high_grad & (max_scale <= scale_threshold)
    split_mask = high_grad & (max_scale > scale_threshold)

    # --- prune set (split sources are also removed, :337-339) ---
    prune_mask = (asset.opacity < opacity_threshold) & asset.alive
    if prune_size_threshold is not None:
        big_ws = max_scale > 0.1 * asset.extent * prune_size_threshold
        prune_mask |= big_ws & asset.alive
        if track is not None:
            # Sampled support points outside the actor box (street-gaussians
            # heritage, :378-403): 2 normal samples per splat in the splat
            # frame; outside if ANY sample leaves the box.
            k_box, key = jax.random.split(key)
            stds3 = jnp.concatenate(
                [asset.scales, jnp.zeros((c, 1))], axis=-1)
            samples = jax.random.normal(k_box, (c, 2, 3)) * stds3[:, None, :]
            rot = quat_lib.to_rotation_matrix(asset.quat)
            pts = jnp.einsum("cij,csj->csi", rot, samples,
                             precision=jax.lax.Precision.HIGHEST) \
                + asset.xyz[:, None, :]
            inside = jnp.all((pts >= track.min_xyz)
                             & (pts <= track.max_xyz), axis=(-2, -1))
            prune_mask |= (~inside) & asset.alive

    kill = prune_mask | split_mask
    alive_after = asset.alive & ~kill

    # --- child list: clones first, then SPLIT_N copies of each split ---
    n_clone = jnp.sum(clone_mask)
    n_split = jnp.sum(split_mask)
    clone_src = _compact(clone_mask)
    split_src = _compact(split_mask)
    pos = jnp.arange(c)
    child_src = jnp.concatenate(
        [clone_src, split_src, split_src])                       # (3C,)
    child_is_split = jnp.concatenate(
        [jnp.zeros((c,), bool), jnp.ones((2 * c,), bool)])
    child_valid = jnp.concatenate(
        [pos < n_clone, pos < n_split, pos < n_split])
    order = jnp.argsort(~child_valid, stable=True)
    n_children = n_clone + SPLIT_N * n_split
    # At most C children can be placed; truncate the compacted list.
    child_src = child_src[order][:c]
    child_is_split = child_is_split[order][:c]

    free_slots = _compact(~alive_after)                          # (C,)
    n_free = c - jnp.sum(alive_after)
    n_spawn = jnp.minimum(n_children, n_free)
    spawn_valid = pos < n_spawn
    src = jnp.clip(child_src, 0, c - 1)
    dst = jnp.where(spawn_valid, free_slots, c)                  # drop-mode

    # --- child parameters (gaussian_model.py:320-333) ---
    k_split, _ = jax.random.split(key)
    stds3 = jnp.concatenate(
        [asset.scales[src], jnp.zeros((c, 1))], axis=-1)
    offsets = jax.random.normal(k_split, (c, 3)) * stds3
    rot = quat_lib.to_rotation_matrix(asset.quat[src])
    split_offset = jnp.einsum("cij,cj->ci", rot, offsets,
                              precision=jax.lax.Precision.HIGHEST)
    is_split_f = child_is_split.astype(jnp.float32)[:, None]
    child_xyz = asset.xyz[src] + is_split_f * split_offset
    child_log_scale = asset.log_scale[src] - child_is_split[:, None] \
        * jnp.log(SPLIT_SHRINK * SPLIT_N)

    new_asset = _dead_fill(asset, kill)
    new_asset = dataclasses.replace(
        new_asset,
        xyz=new_asset.xyz.at[dst].set(child_xyz, mode="drop"),
        f_dc=new_asset.f_dc.at[dst].set(asset.f_dc[src], mode="drop"),
        f_rest=new_asset.f_rest.at[dst].set(asset.f_rest[src], mode="drop"),
        log_scale=new_asset.log_scale.at[dst].set(child_log_scale,
                                                  mode="drop"),
        quat=new_asset.quat.at[dst].set(asset.quat[src], mode="drop"),
        opacity_logit=new_asset.opacity_logit.at[dst].set(
            asset.opacity_logit[src], mode="drop"),
        alive=new_asset.alive.at[dst].set(True, mode="drop"),
    )

    # --- optimizer surgery: killed + spawned slots get fresh moments ---
    opt_state = _zero_moments_at(opt_state, _compact(kill), pos < jnp.sum(kill))
    opt_state = _zero_moments_at(opt_state, jnp.where(spawn_valid, dst, c),
                                 spawn_valid)

    counts = DensifyCounts(
        cloned=n_clone, split=n_split, pruned=jnp.sum(prune_mask),
        dropped=n_children - n_spawn,
        alive=jnp.sum(new_asset.alive))
    return new_asset, opt_state, DensifyStats.zero(c), counts


def reset_opacity(asset: GaussianAsset, opt_state
                  ) -> tuple[GaussianAsset, object]:
    """Clamp opacities to <= 0.01 and reset their Adam moments
    (gaussian_model.py:215-218 + replace_tensor_to_optimizer)."""
    new_logit = jnp.where(
        asset.alive,
        inverse_sigmoid(jnp.minimum(asset.opacity, 0.01)),
        asset.opacity_logit)
    asset = dataclasses.replace(asset, opacity_logit=new_logit)

    # multi_transform state: .inner_states dict keyed by group label —
    # zero only the opacity group's moments.
    def zero_group(state):
        return jax.tree.map(
            lambda n: optax.ScaleByAdamState(
                count=n.count, mu=jax.tree.map(jnp.zeros_like, n.mu),
                nu=jax.tree.map(jnp.zeros_like, n.nu))
            if isinstance(n, optax.ScaleByAdamState) else n,
            state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))

    if hasattr(opt_state, "inner_states"):
        inner = dict(opt_state.inner_states)
        inner["opacity"] = zero_group(inner["opacity"])
        opt_state = opt_state._replace(inner_states=inner) \
            if hasattr(opt_state, "_replace") \
            else dataclasses.replace(opt_state, inner_states=inner)
    else:
        opt_state = zero_group(opt_state)
    return asset, opt_state
