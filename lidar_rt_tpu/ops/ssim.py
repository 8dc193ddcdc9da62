"""Windowed SSIM on range/intensity images.

Semantics match the reference's torch implementation
(lib/utils/loss_utils.py:45-89): 11x11 Gaussian window (sigma 1.5),
same-padding, C1=0.01^2, C2=0.03^2.  The window is an outer product of a 1D
Gaussian, so it is applied as two separable 1D convolutions — cheaper on the
VPU and exactly equal to the reference's 2D conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: Array, win: Array) -> Array:
    """Separable same-padded Gaussian filter over the last two axes of
    (C, H, W)."""
    k = win.shape[0]
    pad = k // 2
    kern_h = win.reshape(1, 1, k, 1)
    kern_w = win.reshape(1, 1, 1, k)
    x = img[:, None, :, :]  # (C, 1, H, W): per-channel grouped conv
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1),
                                     [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1),
                                     [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x[:, 0, :, :]


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: Array, img2: Array, window_size: int = 11,
         sigma: float = 1.5) -> Array:
    """Mean SSIM of two (C, H, W) images in [0, 1]."""
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # E[x^2] - mu^2 cancellation can go (slightly) negative in float; for
    # out-of-range images during a training transient the noise can exceed
    # C2, flipping the denominator sign and exploding both the SSIM value
    # and its gradient (observed as a -inf DSSIM loss mid-training).
    # Clamp variances at 0 and bound the covariance by Cauchy-Schwarz:
    # identical up to float noise for in-range inputs, and guarantees
    # ssim_map in [-1, 1] with bounded gradients for any input.
    sigma1_sq = jnp.maximum(_blur(img1 * img1, win) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_blur(img2 * img2, win) - mu2_sq, 0.0)
    sigma12 = _blur(img1 * img2, win) - mu1_mu2
    # (+eps inside the sqrt keeps its gradient finite at zero variance)
    bound = jnp.sqrt(sigma1_sq * sigma2_sq + 1e-24)
    sigma12 = jnp.clip(sigma12, -bound, bound)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
