"""Multi-chip training step: frames x ray-bands over a ("dp", "rays") mesh.

One shard_map spans the whole mesh: every device owns (one frame of the dp
batch) x (one azimuth band of that frame's scan).  Surfel parameters are
replicated; masked loss terms are computed as local sums and `psum`'d over
both axes before normalization, so the scalar loss — and therefore the
parameter gradients produced by differentiating through the shard_map — are
replicated across the mesh.  XLA turns the loss/grad psums into ICI
all-reduces: the distributed equivalents of the reference's single-GPU
`loss.backward()` + per-Gaussian atomics (backward.cu:615-669).

Feature parity with the single-chip step (train/loop.py): the 5-term loss
including the Chamfer term (train.py:197-207), rebin-interval amortized
binning (a mesh-sharded BinCache — see make_sharded_bin_fn), and tail
re-trace passes (TraceConfig.tail_passes; the cached chain is binned
band-locally).  The warmup-K schedule lives in the trainer
(parallel/trainer.py), which builds one sharded step per config.

Approximations vs the single-chip step (both second-order small):
  * DSSIM is computed per band and averaged (11-px windows don't cross the
    band seam);
  * the Chamfer term compares band-local point sets (a point's true NN can
    live in a neighbouring band).  Each band subsamples its own rays with
    the same effective stride as the single-chip step, so the global point
    budget (opt.cd_max_points) is unchanged.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileAssignment
from lidar_rt_tpu.scene import Scene, compose, split_by_asset
from lidar_rt_tpu.train import losses
from lidar_rt_tpu.train.loop import BinCache, FrameBatch, TrainState

Array = jax.Array

AXES = ("dp", "rays")

# Mesh layout of the band-local tile assignment stream: one frame per dp
# row, band-major tiles along the third axis.
ASSIGN_SPEC = P("dp", None, "rays", None)
BIN_SPECS = BinCache(index=P(None, None, "rays", None),
                     valid=P(None, None, "rays", None), age=P())
BATCH_SPECS = FrameBatch(
    frame=P("dp"), sensor2world=P("dp"),
    gt_depth=P("dp", None, "rays"),
    gt_intensity=P("dp", None, "rays"),
    gt_mask=P("dp", None, "rays"))


def stack_batches(batches: list[FrameBatch]) -> FrameBatch:
    """Stack per-frame batches along a leading dp axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def band_width(frames: LiDARFrames, mesh: Mesh) -> int:
    n_band = mesh.shape["rays"]
    if frames.width % n_band:
        raise ValueError(
            f"width {frames.width} % rays axis {n_band} != 0")
    return frames.width // n_band


def fresh_bins(frames: LiDARFrames, trace_cfg: tracer_lib.TraceConfig,
               mesh: Mesh) -> BinCache:
    """A stale mesh-shaped BinCache: tiles are band-major (each device's
    rays-axis shard holds its own band's tile rows for every frame)."""
    band_w = band_width(frames, mesh)
    tiles_y, tiles_xb = trace_cfg.tile.num_tiles(frames.height, band_w)
    return BinCache.stale(frames.num_frames,
                          mesh.shape["rays"] * tiles_y * tiles_xb,
                          trace_cfg.tile.max_per_tile,
                          passes=trace_cfg.tail_passes + 1)


def make_sharded_bin_fn(frames: LiDARFrames, args,
                        trace_cfg: tracer_lib.TraceConfig, mesh: Mesh,
                        rebin_every: int):
    """Mesh-sharded rebin-interval amortization (train/loop.py BinCache).

    Each device bins its own (frame, band) cell when the frame's cache row
    is stale and reuses it otherwise; the per-frame rows updated by the dp
    groups are merged back into the dp-replicated cache with a delta-psum
    over "dp" (one all-reduce of the cache per step — the price of keeping
    the cache addressable by whichever dp slot a frame lands in next).

    REQUIRES distinct frames within a dp batch: two dp groups updating the
    same cache row would double the merged delta.  The trainer samples
    without replacement (parallel/trainer.py _sample_ids).

    Returns bin_fn(scene, batch, bins) ->
      (index (dp, passes, T, K), valid (dp, passes, T, K), new BinCache)
    with T band-major over the rays axis.
    """
    grid, width = frames.grid, frames.width
    band_w = band_width(frames, mesh)
    tail = int(trace_cfg.tail_passes)
    bin_tile = dataclasses.replace(trace_cfg.tile,
                                   pad_px=max(trace_cfg.tile.pad_px, 2.0),
                                   snap_pad_px=0.5)

    # check_vma=False on every shard_map wrapping the pallas tracer:
    # pallas_call out_shapes carry no varying-mesh-axes metadata, and
    # jax's vma check rejects that on real TPU (CPU interpret mode never
    # exercises it — found by scripts/sharded_overhead.py on-chip, r5).
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), BATCH_SPECS, BIN_SPECS),
        out_specs=(ASSIGN_SPEC, ASSIGN_SPEC, BIN_SPECS))
    def bin_fn(scene: Scene, batch: FrameBatch, bins: BinCache):
        local = jax.tree.map(lambda x: x[0], batch)   # my dp frame
        band = jax.lax.axis_index("rays")
        f = local.frame
        stale = bins.age[f] >= rebin_every

        def fresh():
            bundle, _ = compose(scene, f)
            chain = tracer_lib.bin_tail_chain(
                bundle, grid, width,
                transforms.invert_se3(local.sensor2world), bin_tile, tail,
                col_offset=band * band_w, num_cols=band_w)
            return (jnp.stack([a.index.astype(jnp.int32) for a in chain]),
                    jnp.stack([a.valid for a in chain]))

        idx, val = jax.lax.cond(
            stale, fresh, lambda: (bins.index[f], bins.valid[f]))

        # dp-delta merge: each dp group changed exactly its own frame's row.
        def merged(old, new):
            d = new.astype(jnp.int32) - old.astype(jnp.int32)
            return old.astype(jnp.int32) + jax.lax.psum(d, "dp")

        # Ages advance for EVERY frame each step (global-step staleness,
        # matching the single-chip cache): drift accrues per optimizer
        # step, so staleness must not scale with the frame count.
        base_age = bins.age + 1
        new_bins = BinCache(
            index=merged(bins.index, bins.index.at[f].set(idx)),
            valid=merged(bins.valid, bins.valid.at[f].set(val)) > 0,
            age=merged(base_age,
                       base_age.at[f].set(jnp.where(stale, 1,
                                                    base_age[f]))))
        return idx[None], val[None], new_bins

    return bin_fn


def make_sharded_loss_fn(frames: LiDARFrames, args,
                         trace_cfg: tracer_lib.TraceConfig, mesh: Mesh):
    """Build the mesh-spanning loss: (params_bg, params_ac, probe, scene,
    batch[, assignment]) -> (replicated scalar loss, {"accum": psum'd
    per-surfel weights, "breakdown": replicated LossBreakdown}).

    `assignment` is the optional cached band-local binning — a pair of
    (dp, passes, T, K) arrays from make_sharded_bin_fn; None re-bins inside
    the trace every call (the reference's rebuild-every-iteration GAS,
    gaussian_renderer __init__.py:142-145).

    Exposed separately from the train step so equivalence tests can
    differentiate it directly (e.g. dp=2 grads vs the mean of two dp=1
    frame grads)."""
    grid, width = frames.grid, frames.width
    band_w = band_width(frames, mesh)
    n_band = mesh.shape["rays"]
    lw = losses.LossWeights(
        depth_l1=args.opt.lambda_depth_l1,
        intensity_l1=args.opt.lambda_intensity_l1,
        intensity_l2=args.opt.lambda_intensity_l2,
        intensity_dssim=args.opt.lambda_intensity_dssim,
        raydrop_bce=args.opt.lambda_raydrop_bce,
        cd=args.opt.lambda_cd,
        reg=args.opt.lambda_reg)
    use_rayhit = bool(args.opt.use_rayhit)
    use_cd = float(args.opt.lambda_cd) > 0
    # Same effective ray stride as the single-chip step: the global point
    # budget opt.cd_max_points is split evenly over the ray bands.
    cd_budget = max(1, int(getattr(args.opt, "cd_max_points", 16384))
                    // n_band)
    cd_stride = max(1, (frames.height * band_w) // cd_budget)
    n_passes = int(trace_cfg.tail_passes) + 1

    def global_masked_mean(x, m):
        num = jax.lax.psum(jnp.sum(x * m), AXES)
        den = jax.lax.psum(jnp.sum(m), AXES)
        return num / jnp.maximum(den, 1.0)

    def loss_fn(params_bg, params_ac, probe, scene: Scene,
                batch: FrameBatch, assignment=None):
        has_assignment = assignment is not None
        in_specs = (P(), P(), P(), P(), BATCH_SPECS)
        if has_assignment:
            in_specs = in_specs + (ASSIGN_SPEC, ASSIGN_SPEC)

        @functools.partial(
            jax.shard_map, mesh=mesh, check_vma=False,
            in_specs=in_specs,
            out_specs=(P(), P()),
        )
        def sharded(params_bg, params_ac, probe, scene, batch, *assign):
            local = jax.tree.map(lambda x: x[0], batch)   # my dp frame
            band = jax.lax.axis_index("rays")

            bg = scene.background.with_params(params_bg)
            sc = dataclasses.replace(scene, background=bg)
            if params_ac is not None:
                sc = dataclasses.replace(
                    sc, actors=scene.actors.with_params(params_ac))
            bundle, _ = compose(sc, local.frame)
            bundle = bundle._replace(means=bundle.means + probe)

            assignment_local = None
            if has_assignment:
                a_idx, a_val = assign[0][0], assign[1][0]
                t_band = a_idx.shape[1]

                def mk(p):
                    return TileAssignment(
                        index=a_idx[p], valid=a_val[p],
                        truncated=jnp.zeros((t_band,), jnp.int32))

                assignment_local = (mk(0) if n_passes == 1
                                    else [mk(p) for p in range(n_passes)])

            background = jnp.array([0.0, 0.0, 1.0])
            out = tracer_lib.trace(
                bundle, grid, width, local.sensor2world, background,
                sc.background.active_sh_degree, trace_cfg,
                assignment=assignment_local,
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

            loss_cd = jnp.zeros(())
            if use_cd:
                # Band-local Chamfer on back-projected strided rays
                # (train.py:197-207); each band compares its own pred/gt
                # point sets (documented approximation, module docstring).
                origin, dirs3 = rays_lib.range_rays(grid, width,
                                                    local.sensor2world)
                band_dirs = jax.lax.dynamic_slice_in_dim(
                    dirs3, band * band_w, band_w, axis=1)
                dirs_f = band_dirs.reshape(-1, 3)[::cd_stride]
                mm = local.gt_mask.reshape(-1)[::cd_stride]
                pred = origin + dirs_f * depth.reshape(-1)[
                    ::cd_stride, None]
                gt = origin + dirs_f * local.gt_depth.reshape(-1)[
                    ::cd_stride, None]
                loss_cd = lw.cd * jax.lax.pmean(
                    losses.chamfer_loss(pred, mm, gt, mm), AXES)

            reg = losses.box_reg_loss(sc.background, None)
            if params_ac is not None:
                reg = reg + jnp.sum(jax.vmap(losses.box_reg_loss)(
                    sc.actors, sc.tracks))
            loss_reg = lw.reg * reg
            loss = (loss_depth + loss_int + loss_drop + loss_cd + loss_reg)
            breakdown = losses.LossBreakdown(
                total=loss, depth=loss_depth, intensity=loss_int,
                raydrop=loss_drop, cd=loss_cd, reg=loss_reg)
            # Per-surfel accumulated weights: reduce over every band/frame.
            accum = jax.lax.psum(out.accum_weights, AXES)
            return loss, {"accum": accum, "breakdown": breakdown}

        call_args = (params_bg, params_ac, probe, scene, batch)
        if has_assignment:
            call_args = call_args + tuple(assignment)
        return sharded(*call_args)

    return loss_fn


def make_sharded_train_step(frames: LiDARFrames, args,
                            trace_cfg: tracer_lib.TraceConfig,
                            opt_bg, opt_ac, mesh: Mesh,
                            rebin_every: int = 0):
    """Build the jitted multi-chip training step.

    The dp batch size equals mesh.shape["dp"]; each scan's azimuth axis is
    split into mesh.shape["rays"] bands.  rebin_every > 0 enables the
    mesh-sharded BinCache (state.bins must be a fresh_bins() cache; the
    trainer invalidates it at densify/opacity-reset events exactly as on a
    single chip).
    """
    loss_fn = make_sharded_loss_fn(frames, args, trace_cfg, mesh)
    bin_fn = (make_sharded_bin_fn(frames, args, trace_cfg, mesh,
                                  rebin_every)
              if rebin_every else None)

    @jax.jit
    def train_step(state: TrainState, batch: FrameBatch
                   ) -> tuple[TrainState, dict]:
        scene = state.scene
        params_bg = scene.background.params()
        params_ac = scene.actors.params() if scene.actors is not None \
            else None
        probe = jnp.zeros((scene.total_capacity, 3))

        assignment, new_bins = None, state.bins
        if bin_fn is not None:
            a_idx, a_val, new_bins = bin_fn(scene, batch, state.bins)
            assignment = (a_idx, a_val)

        def wrapped(p_bg, p_ac, probe):
            loss, aux = loss_fn(p_bg, p_ac, probe, scene, batch,
                                assignment)
            return loss, aux

        argnums = (0, 2) if params_ac is None else (0, 1, 2)
        (loss, aux), grads = jax.value_and_grad(
            wrapped, argnums=argnums, has_aux=True)(
            params_bg, params_ac, probe)
        accum = aux["accum"]
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

        bd = aux["breakdown"]
        metrics = {"loss": loss, "depth": bd.depth,
                   "intensity": bd.intensity, "raydrop": bd.raydrop,
                   "cd": bd.cd, "reg": bd.reg}
        return TrainState(scene=new_scene, opt_state_bg=opt_state_bg,
                          stats_bg=stats_bg, opt_state_actors=opt_state_ac,
                          stats_actors=stats_ac, key=state.key,
                          bins=new_bins), metrics

    return train_step
