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
    """Returns (module, variables, loss history)."""
    model = RayDropUNet(in_ch=inputs.shape[-1])
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    variables = model.init({"params": k_init, "dropout": key},
                           jnp.asarray(inputs[:1]), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
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

    @jax.jit
    def apply_updates(params, opt_state, grads):
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    rng = random.Random(seed)
    n = inputs.shape[0]
    history = []
    for epoch in range(epochs):
        order = list(range(n))
        rng.shuffle(order)
        accum = None
        count = 0
        epoch_loss = 0.0
        for i in order:
            x = inputs[i:i + 1]
            y = labels[i:i + 1]
            if use_rot:
                shift = rng.randrange(x.shape[2])
                x = np.roll(x, shift, axis=2)
                y = np.roll(y, shift, axis=2)
            key, k_drop = jax.random.split(key)
            loss, g, batch_stats = grad_one(params, batch_stats,
                                            jnp.asarray(x), jnp.asarray(y),
                                            k_drop)
            epoch_loss += float(loss)
            accum = g if accum is None else jax.tree.map(jnp.add, accum, g)
            count += 1
            if count == batch_size:
                params, opt_state = apply_updates(
                    params, opt_state,
                    jax.tree.map(lambda v: v / batch_size, accum))
                accum, count = None, 0
        if accum is not None:
            params, opt_state = apply_updates(
                params, opt_state, jax.tree.map(lambda v: v / count, accum))
        history.append(epoch_loss / n)
    return model, {"params": params, "batch_stats": batch_stats}, history


def apply_unet(model: RayDropUNet, variables, raydrop: Array,
               intensity: Array, depth: Array, ray_o: Array | None = None,
               ray_d: Array | None = None) -> Array:
    """Inference: refined drop probability (H, W) (eval.py:129-144)."""
    x = unet_input(raydrop, intensity, depth, ray_o, ray_d)
    out = model.apply(variables, x, train=False)
    return out[0, ..., 0]
