"""Ray-drop refinement phase: train the U-Net on rendered channels.

Equivalent of the reference's post-hoc refinement loop (train.py:386-447):
after Gaussian optimization, every train frame is rendered once (detached),
and the U-Net learns to map (raydrop, intensity, depth [+ rays]) to the
recorded drop mask with BCE, Adam lr 1e-3, gradient accumulation over 16
frames, 400 epochs, with an optional random azimuth roll augment
(train.py:419-424 — rays wrap, so rolling the raster is a pose-consistent
augmentation).
"""

from __future__ import annotations

import random
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.models.unet import RayDropUNet, unet_input

Array = jax.Array


def collect_inputs(render_fn, frames: LiDARFrames, frame_ids: list[int],
                   use_spatial: bool) -> tuple[np.ndarray, np.ndarray]:
    """Render every frame once and stack U-Net inputs + labels.

    render_fn(frame_id) -> dict with depth/intensity/raydrop (H, W).
    Returns (inputs (F, H, W, C), labels (F, H, W, 1))."""
    xs, ys = [], []
    for f in frame_ids:
        out = render_fn(f)
        if use_spatial:
            origin, dirs = frames.rays(f)
            ray_o = jnp.broadcast_to(origin, dirs.shape)
            x = unet_input(out["raydrop"], out["intensity"], out["depth"],
                           ray_o, dirs)
        else:
            x = unet_input(out["raydrop"], out["intensity"], out["depth"])
        xs.append(np.asarray(x[0]))
        ys.append(np.asarray(~frames.mask(f), np.float32)[..., None])
    return np.stack(xs), np.stack(ys)


def train_unet(inputs: np.ndarray, labels: np.ndarray, *, epochs: int = 400,
               batch_size: int = 16, lr: float = 1e-3, seed: int = 0,
               use_rot: bool = False) -> tuple[RayDropUNet, Any, list[float]]:
    """Returns (module, variables, loss history).

    The whole dataset lives device-resident and each epoch is ONE jitted
    dispatch (a lax.scan over shuffled frames with in-scan gradient
    accumulation).  The reference iterates frames from python
    (train.py:391-445), which costs an upload + a blocking loss fetch per
    frame per epoch — through a remote-device link that dominates the whole
    phase (~1s x frames x epochs).
    """
    model = RayDropUNet(in_ch=inputs.shape[-1])
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    variables = model.init({"params": k_init, "dropout": key},
                           jnp.asarray(inputs[:1]), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    opt = optax.adam(lr)
    opt_state = opt.init(params)
    x_all = jnp.asarray(inputs)          # (F, H, W, C), uploaded once
    y_all = jnp.asarray(labels)
    n = inputs.shape[0]
    zero_g = jax.tree.map(jnp.zeros_like, params)

    def grad_one(params, batch_stats, x, y, drop_key):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": drop_key}, mutable=["batch_stats"])
            pred = jnp.clip(out, 1e-7, 1.0 - 1e-7)
            bce = -(y * jnp.log(pred) + (1 - y) * jnp.log(1 - pred))
            return jnp.mean(bce), updates["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        return loss, g, new_stats

    def apply_accum(params, opt_state, accum, count):
        upd, opt_state = opt.update(
            jax.tree.map(lambda v: v / count.astype(jnp.float32), accum),
            opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    # x_all/y_all enter as ARGUMENTS, not closure constants: jit would bake
    # closed-over arrays into the HLO as literals, and at Waymo scale the
    # remote-compile payload (50 x 64 x 2650 x C floats) exceeds what a
    # tunneled device accepts (HTTP 413).  As parameters they travel once
    # as device buffer handles.
    @jax.jit
    def epoch_fn(params, batch_stats, opt_state, perm, key, x_all, y_all):
        def body(carry, f):
            params, batch_stats, opt_state, accum, count, key = carry
            x = x_all[f][None]
            y = y_all[f][None]
            key, k_drop, k_roll = jax.random.split(key, 3)
            if use_rot:
                # Random azimuth roll augment (train.py:419-424): rays wrap,
                # so rolling the raster is pose-consistent.
                shift = jax.random.randint(k_roll, (), 0, x.shape[2])
                x = jnp.roll(x, shift, axis=2)
                y = jnp.roll(y, shift, axis=2)
            loss, g, batch_stats = grad_one(params, batch_stats, x, y,
                                            k_drop)
            accum = jax.tree.map(jnp.add, accum, g)
            count = count + 1
            full = count == batch_size
            params, opt_state, accum = jax.lax.cond(
                full,
                lambda a: (*apply_accum(a[0], a[1], a[2], jnp.asarray(
                    batch_size, jnp.int32)), zero_g),
                lambda a: a,
                (params, opt_state, accum))
            count = jnp.where(full, 0, count)
            return (params, batch_stats, opt_state, accum, count, key), loss

        carry = (params, batch_stats, opt_state, zero_g, jnp.int32(0), key)
        carry, losses = jax.lax.scan(body, carry, perm)
        params, batch_stats, opt_state, accum, count, key = carry
        # trailing partial batch (reference divides by the remainder)
        params, opt_state = jax.lax.cond(
            count > 0,
            lambda a: apply_accum(a[0], a[1], accum,
                                  jnp.maximum(count, 1)),
            lambda a: (a[0], a[1]),
            (params, opt_state))
        return params, batch_stats, opt_state, jnp.mean(losses)

    rng = random.Random(seed)
    history = []
    for _ in range(epochs):
        order = list(range(n))
        rng.shuffle(order)
        key, k_epoch = jax.random.split(key)
        params, batch_stats, opt_state, mean_loss = epoch_fn(
            params, batch_stats, opt_state, jnp.asarray(order, jnp.int32),
            k_epoch, x_all, y_all)
        history.append(float(mean_loss))
    return model, {"params": params, "batch_stats": batch_stats}, history


def apply_unet(model: RayDropUNet, variables, raydrop: Array,
               intensity: Array, depth: Array, ray_o: Array | None = None,
               ray_d: Array | None = None) -> Array:
    """Inference: refined drop probability (H, W) (eval.py:129-144)."""
    x = unet_input(raydrop, intensity, depth, ray_o, ray_d)
    out = model.apply(variables, x, train=False)
    return out[0, ..., 0]
