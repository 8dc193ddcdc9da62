"""Training losses: masked L1/L2/BCE/DSSIM, Chamfer, box regularization.

Equivalents of the reference's loss assembly (train.py:162-214 with weights
configs/exp.yaml:37-43, primitives lib/utils/loss_utils.py).  Boolean-mask
fancy indexing (`depth[gt_mask]`) becomes masked means so shapes stay static
under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_rt_tpu.ops import chamfer as chamfer_lib
from lidar_rt_tpu.ops import ssim as ssim_lib
from lidar_rt_tpu.scene.asset import GaussianAsset
from lidar_rt_tpu.scene.tracks import ActorTrack

Array = jax.Array


def masked_mean(x: Array, mask: Array) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    d = jnp.abs(pred - gt)
    return jnp.mean(d) if mask is None else masked_mean(d, mask)


def l2(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    d = (pred - gt) ** 2
    return jnp.mean(d) if mask is None else masked_mean(d, mask)


def psnr(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    """Peak signal-to-noise for data in [0, 1] (loss_utils.py:27-43)."""
    mse = l2(pred, gt, mask)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def bce_probs(preds: Array, labels: Array, eps: float = 1e-7) -> Array:
    """BCE on probabilities (torch BCELoss path, loss_utils.py:111-124:
    the train loop always calls it with `preds=raydrop_prob`)."""
    p = jnp.clip(preds, eps, 1.0 - eps)
    labels = labels.astype(p.dtype)
    return jnp.mean(-(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p)))


def binary_focal(preds: Array, labels: Array, alpha: float = 0.25,
                 gamma: float = 2.0, eps: float = 1e-7) -> Array:
    """Binary focal loss on probabilities (loss_utils.py:93-109)."""
    labels = labels.astype(preds.dtype)
    loss_y1 = -(1.0 - alpha) * (1.0 - preds) ** gamma * jnp.log(preds + eps) \
        * labels
    loss_y0 = -alpha * preds ** gamma * jnp.log1p(-preds + eps) * (1.0 - labels)
    return jnp.mean(loss_y0 + loss_y1)


def dssim(pred: Array, gt: Array) -> Array:
    """1 - SSIM on a single-channel (H, W) image pair."""
    return 1.0 - ssim_lib.ssim(pred[None], gt[None])


def box_reg_loss(asset: GaussianAsset, track: ActorTrack | None) -> Array:
    """Keep actor splats inside their box and all splats small relative to
    the asset extent (reference gaussian_model.py:413-422: box term only for
    boxed assets, weight 100; scale term always)."""
    m = asset.alive.astype(jnp.float32)
    scale_loss = masked_mean(jnp.max(asset.scales, axis=-1) * m,
                             asset.alive) / asset.extent
    if track is None:
        return scale_loss
    over = jnp.clip(asset.xyz - track.max_xyz, 0.0, None)
    under = jnp.clip(track.min_xyz - asset.xyz, 0.0, None)
    box = (masked_mean(over * m[:, None], jnp.broadcast_to(
        asset.alive[:, None], over.shape)) +
        masked_mean(under * m[:, None], jnp.broadcast_to(
            asset.alive[:, None], under.shape))) / asset.extent
    return box * 100.0 + scale_loss


class LossWeights(NamedTuple):
    """Mirror of configs/exp.yaml:37-43."""

    depth_l1: float = 0.1
    intensity_l1: float = 0.85
    intensity_l2: float = 0.0
    intensity_dssim: float = 0.15
    raydrop_bce: float = 0.01
    cd: float = 0.01
    reg: float = 0.01


class LossBreakdown(NamedTuple):
    total: Array
    depth: Array
    intensity: Array
    raydrop: Array
    cd: Array
    reg: Array


def render_losses(depth: Array, intensity: Array, raydrop_prob: Array,
                  gt_depth: Array, gt_intensity: Array, gt_mask: Array,
                  weights: LossWeights, cd_loss: Array | None = None,
                  reg_loss: Array | None = None) -> LossBreakdown:
    """The 5-term training loss on one rendered frame (train.py:162-214).

    All images (H, W); gt_mask is the "ray returned" mask; raydrop labels
    are its complement (train.py:188-194).
    """
    zero = jnp.zeros(())
    loss_depth = weights.depth_l1 * l1(depth, gt_depth, gt_mask)
    mask_f = gt_mask.astype(intensity.dtype)
    loss_intensity = (
        weights.intensity_l1 * l1(intensity, gt_intensity, gt_mask)
        + weights.intensity_l2 * l2(intensity, gt_intensity, gt_mask)
        + weights.intensity_dssim * dssim(intensity * mask_f,
                                          gt_intensity * mask_f))
    loss_raydrop = weights.raydrop_bce * bce_probs(raydrop_prob, ~gt_mask)
    loss_cd = zero if cd_loss is None else weights.cd * cd_loss
    loss_reg = zero if reg_loss is None else weights.reg * reg_loss
    total = loss_depth + loss_intensity + loss_raydrop + loss_cd + loss_reg
    return LossBreakdown(total=total, depth=loss_depth,
                         intensity=loss_intensity, raydrop=loss_raydrop,
                         cd=loss_cd, reg=loss_reg)


def chamfer_loss(pred_pts: Array, pred_mask: Array, gt_pts: Array,
                 gt_mask: Array) -> Array:
    """CD between back-projected prediction and ground truth point clouds
    (train.py:197-207)."""
    return chamfer_lib.chamfer_distance(pred_pts, pred_mask, gt_pts, gt_mask)
