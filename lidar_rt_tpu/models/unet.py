"""Ray-drop refinement U-Net (flax, NHWC).

Functional equivalent of the reference's LiDAR4D-derived refinement net
(lib/scene/unet.py:148-181): 1x1 stem to 32ch, four maxpool double-conv
downs (32-64-128-256-256), a multi-head self-attention bottleneck, four
bilinear-upsample skip-connected ups, 1x1 head with sigmoid.  Inputs are
(raydrop, intensity, depth) [+ ray origin/direction if use_spatial -> 9ch]
(train.py:398-417); output is the refined ray-drop probability.

Layout is NHWC (TPU conv-native) rather than the reference's NCHW.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class DoubleConv(nn.Module):
    """(BN -> ReLU -> Dropout -> Conv3x3) x 2 (reference unet.py:14-35)."""

    out_ch: int
    mid_ch: int | None = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        mid = self.mid_ch or self.out_ch
        for ch in (mid, self.out_ch):
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False)(x)
        return x


class AttnBlock(nn.Module):
    """Spatial multi-head self-attention bottleneck (unet.py:76-115)."""

    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        b, h, w, c = x.shape
        y = nn.BatchNorm(use_running_average=not train)(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False)(y)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, hd).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k) * (hd ** -0.5)
        if train:
            drop = self.make_rng("dropout")
            mask = jax.random.bernoulli(drop, self.dropout, logits.shape)
            logits = jnp.where(mask, -1e12, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), use_bias=False)(out)
        return x + out


def _up_to(x: Array, target_hw: tuple[int, int]) -> Array:
    """Bilinear 2x upsample padded/cropped to the skip's spatial shape."""
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
    th, tw = target_hw
    dh, dw = th - x.shape[1], tw - x.shape[2]
    if dh > 0 or dw > 0:
        x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
    return x[:, :th, :tw]


class RayDropUNet(nn.Module):
    """in: (B, H, W, in_ch); out: (B, H, W, 1) refined drop probability."""

    in_ch: int = 3
    channels: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ch = self.channels
        x0 = nn.Conv(ch, (1, 1))(x)

        def down(y, out_ch):
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            return DoubleConv(out_ch)(y, train)

        x1 = down(x0, ch * 2)
        x2 = down(x1, ch * 4)
        x3 = down(x2, ch * 8)
        x4 = down(x3, ch * 8)
        x4 = AttnBlock()(x4, train)

        def up(y, skip, out_ch):
            y = _up_to(y, skip.shape[1:3])
            y = jnp.concatenate([skip, y], axis=-1)
            in_ch = y.shape[-1]
            return DoubleConv(out_ch, mid_ch=in_ch)(y, train)

        y = up(x4, x3, ch * 4)
        y = up(y, x2, ch * 2)
        y = up(y, x1, ch)
        y = up(y, x0, ch)

        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        logits = nn.Conv(1, (1, 1))(y)
        return jax.nn.sigmoid(logits)


def unet_input(raydrop: Array, intensity: Array, depth: Array,
               ray_o: Array | None = None, ray_d: Array | None = None
               ) -> Array:
    """Stack the refinement input channels (train.py:398-417): (H, W, 3) or
    (H, W, 9) with spatial ray encoding; adds the batch axis."""
    chans = [raydrop[..., None], intensity[..., None], depth[..., None]]
    if ray_o is not None:
        chans.extend([ray_o, ray_d])
    return jnp.concatenate(chans, axis=-1)[None]
