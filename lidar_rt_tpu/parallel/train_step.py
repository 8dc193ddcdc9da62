"""Multi-chip training step: frames x ray-bands over a ("dp", "rays") mesh.

One shard_map spans the whole mesh: every device owns (one frame of the dp
batch) x (one azimuth band of that frame's scan).  Surfel parameters are
replicated; masked loss terms are computed as local sums and `psum`'d over
both axes before normalization, so the scalar loss — and therefore the
parameter gradients produced by differentiating through the shard_map — are
replicated across the mesh.  XLA turns the loss/grad psums into ICI
all-reduces: the distributed equivalents of the reference's single-GPU
`loss.backward()` + per-Gaussian atomics (backward.cu:615-669).

Approximations vs the single-chip step (both second-order small):
  * DSSIM is computed per band and averaged (11-px windows don't cross the
    band seam);
  * the Chamfer term compares band-local point sets (a point's true NN can
    live in a neighbouring band).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.scene import Scene, compose, split_by_asset
from lidar_rt_tpu.train import losses
from lidar_rt_tpu.train.loop import FrameBatch, TrainState

Array = jax.Array

AXES = ("dp", "rays")


def stack_batches(batches: list[FrameBatch]) -> FrameBatch:
    """Stack per-frame batches along a leading dp axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_sharded_loss_fn(frames: LiDARFrames, args,
                         trace_cfg: tracer_lib.TraceConfig, mesh: Mesh):
    """Build the mesh-spanning loss: (params_bg, params_ac, probe, scene,
    batch) -> (replicated scalar loss, psum'd per-surfel accum weights).

    Exposed separately from the train step so equivalence tests can
    differentiate it directly (e.g. dp=2 grads vs the mean of two dp=1
    frame grads)."""
    grid, width = frames.grid, frames.width
    n_band = mesh.shape["rays"]
    if width % n_band:
        raise ValueError(f"width {width} % rays axis {n_band} != 0")
    band_w = width // n_band
    lw = losses.LossWeights(
        depth_l1=args.opt.lambda_depth_l1,
        intensity_l1=args.opt.lambda_intensity_l1,
        intensity_l2=args.opt.lambda_intensity_l2,
        intensity_dssim=args.opt.lambda_intensity_dssim,
        raydrop_bce=args.opt.lambda_raydrop_bce,
        cd=args.opt.lambda_cd,
        reg=args.opt.lambda_reg)
    use_rayhit = bool(args.opt.use_rayhit)

    batch_specs = FrameBatch(
        frame=P("dp"), sensor2world=P("dp"),
        gt_depth=P("dp", None, "rays"),
        gt_intensity=P("dp", None, "rays"),
        gt_mask=P("dp", None, "rays"))

    def global_masked_mean(x, m):
        num = jax.lax.psum(jnp.sum(x * m), AXES)
        den = jax.lax.psum(jnp.sum(m), AXES)
        return num / jnp.maximum(den, 1.0)

    def loss_fn(params_bg, params_ac, probe, scene: Scene,
                batch: FrameBatch):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P(), batch_specs),
            out_specs=(P(), P()),
        )
        def sharded(params_bg, params_ac, probe, scene, batch):
            local = jax.tree.map(lambda x: x[0], batch)   # my dp frame
            band = jax.lax.axis_index("rays")

            bg = scene.background.with_params(params_bg)
            sc = dataclasses.replace(scene, background=bg)
            if params_ac is not None:
                sc = dataclasses.replace(
                    sc, actors=scene.actors.with_params(params_ac))
            bundle, _ = compose(sc, local.frame)
            bundle = bundle._replace(means=bundle.means + probe)

            background = jnp.array([0.0, 0.0, 1.0])
            out = tracer_lib.trace(
                bundle, grid, width, local.sensor2world, background,
                sc.background.active_sh_degree, trace_cfg,
                col_offset=band * band_w, render_width=band_w)
            intensity = out.channels[..., 0]
            depth = out.channels[..., 3]
            if use_rayhit:
                logits = jnp.stack([out.channels[..., 1],
                                    out.channels[..., 2]], axis=-1)
                raydrop = jax.nn.softmax(logits, axis=-1)[..., 1]
            else:
                raydrop = jax.nn.sigmoid(out.channels[..., 2])

            m = local.gt_mask.astype(depth.dtype)
            loss_depth = lw.depth_l1 * global_masked_mean(
                jnp.abs(depth - local.gt_depth), m)
            loss_int = (
                lw.intensity_l1 * global_masked_mean(
                    jnp.abs(intensity - local.gt_intensity), m)
                + lw.intensity_l2 * global_masked_mean(
                    (intensity - local.gt_intensity) ** 2, m)
                + lw.intensity_dssim * jax.lax.pmean(
                    losses.dssim(intensity * m, local.gt_intensity * m),
                    AXES))
            p = jnp.clip(raydrop, 1e-7, 1.0 - 1e-7)
            lbl = (~local.gt_mask).astype(p.dtype)
            bce = -(lbl * jnp.log(p) + (1.0 - lbl) * jnp.log(1.0 - p))
            loss_drop = lw.raydrop_bce * jax.lax.pmean(jnp.mean(bce), AXES)

            reg = losses.box_reg_loss(sc.background, None)
            if params_ac is not None:
                reg = reg + jnp.sum(jax.vmap(losses.box_reg_loss)(
                    sc.actors, sc.tracks))
            loss = loss_depth + loss_int + loss_drop + lw.reg * reg
            # Per-surfel accumulated weights: reduce over every band/frame.
            accum = jax.lax.psum(out.accum_weights, AXES)
            return loss, accum

        return sharded(params_bg, params_ac, probe, scene, batch)

    return loss_fn


def make_sharded_train_step(frames: LiDARFrames, args,
                            trace_cfg: tracer_lib.TraceConfig,
                            opt_bg, opt_ac, mesh: Mesh):
    """Build the jitted multi-chip training step.

    The dp batch size equals mesh.shape["dp"]; each scan's azimuth axis is
    split into mesh.shape["rays"] bands.
    """
    loss_fn = make_sharded_loss_fn(frames, args, trace_cfg, mesh)

    @jax.jit
    def train_step(state: TrainState, batch: FrameBatch
                   ) -> tuple[TrainState, dict]:
        scene = state.scene
        params_bg = scene.background.params()
        params_ac = scene.actors.params() if scene.actors is not None \
            else None
        probe = jnp.zeros((scene.total_capacity, 3))

        def wrapped(p_bg, p_ac, probe):
            loss, accum = loss_fn(p_bg, p_ac, probe, scene, batch)
            return loss, accum

        argnums = (0, 2) if params_ac is None else (0, 1, 2)
        (loss, accum), grads = jax.value_and_grad(
            wrapped, argnums=argnums, has_aux=True)(
            params_bg, params_ac, probe)
        if params_ac is None:
            g_bg, g_probe = grads
            g_ac = None
        else:
            g_bg, g_ac, g_probe = grads

        upd, opt_state_bg = opt_bg.update(g_bg, state.opt_state_bg,
                                          params_bg)
        new_scene = dataclasses.replace(
            scene,
            background=scene.background.with_params(
                optax.apply_updates(params_bg, upd)))
        opt_state_ac = state.opt_state_actors
        if params_ac is not None:
            upd_ac, opt_state_ac = opt_ac.update(
                g_ac, state.opt_state_actors, params_ac)
            new_scene = dataclasses.replace(
                new_scene, actors=scene.actors.with_params(
                    optax.apply_updates(params_ac, upd_ac)))

        parts_g = split_by_asset(scene, g_probe)
        parts_w = split_by_asset(scene, accum)
        stats_bg = state.stats_bg.add(parts_g[0], parts_w[0] > 0)
        stats_ac = state.stats_actors
        if stats_ac is not None:
            stats_ac = stats_ac.add(jnp.concatenate(parts_g[1:], axis=0),
                                    jnp.concatenate(parts_w[1:], axis=0) > 0)

        return TrainState(scene=new_scene, opt_state_bg=opt_state_bg,
                          stats_bg=stats_bg, opt_state_actors=opt_state_ac,
                          stats_actors=stats_ac, key=state.key), \
            {"loss": loss}

    return train_step
