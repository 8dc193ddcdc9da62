"""The training driver: jitted step + python-side schedule orchestration.

Equivalent of the reference's `training()` loop (train.py:67-447) and
`SceneLidar.optimize` (lib/dataloader/gs_loader.py:243-298):

  * one jitted `train_step` renders a frame, evaluates the 5-term loss,
    backprops through the tiled tracer, applies per-asset Adam, and
    accumulates densification statistics (world-mean gradient norms via an
    explicit zero probe — the JAX equivalent of `means3D.retain_grad()`,
    lib/gaussian_renderer/__init__.py:136-140),
  * the python driver owns the schedule: shuffled frame sampling, SH degree
    warm-up every 1000 iters, densify/prune every 100 in [500, 15000],
    opacity reset every 3000, periodic eval + best-checkpoint retention.

All jitted functions close over static shapes only; scene capacity never
changes, so the whole schedule reuses two compiled programs (train step +
densify pass).
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.data.frames import LiDARFrames
from lidar_rt_tpu.ops import tracer as tracer_lib
from lidar_rt_tpu.ops.binning import TileAssignment, TileConfig
from lidar_rt_tpu.scene import Scene, compose, split_by_asset
from lidar_rt_tpu.train import density, losses, optim

Array = jax.Array


class FrameBatch(NamedTuple):
    """Device-side per-iteration inputs (one scan)."""

    frame: Array          # () int32 index into the track timeline
    sensor2world: Array   # (4, 4)
    gt_depth: Array       # (H, W)
    gt_intensity: Array   # (H, W)
    gt_mask: Array        # (H, W) bool


class BinCache(NamedTuple):
    """Per-frame cached tile assignments (rebin-interval amortization).

    Binning is a stop-gradient visibility oracle (the BVH analogue); the
    reference rebuilds its GAS every iteration (gaussian_renderer
    __init__.py:142-145) because CUDA BVH builds are cheap relative to its
    tracer, but on TPU binning is ~25% of a training step.  Between
    densification events surfel positions drift by only ~lr-sized amounts,
    so a frame's assignment binned with a few pixels of footprint padding
    (TileConfig.pad_px) stays a superset of the true candidate set for many
    steps.  `age[f]` counts GLOBAL optimizer steps since frame f was last
    binned (every step ages every frame's cache — drift accrues per step,
    not per render, so staleness must not scale with the frame count);
    densify / opacity-reset / capacity events invalidate the whole cache.

    P (= tail_passes + 1) caches the whole tail re-trace chain per frame:
    pass p's assignment is binned strictly past pass p-1's per-tile K-th
    candidate range, so the cached chains stay disjoint by construction
    (ops/tracer.bin_tail_chain).
    """

    index: Array   # (F, P, T, K) int32
    valid: Array   # (F, P, T, K) bool
    age: Array     # (F,) int32

    @staticmethod
    def stale(num_frames: int, t_total: int, k: int,
              passes: int = 1) -> "BinCache":
        return BinCache(
            index=jnp.zeros((num_frames, passes, t_total, k), jnp.int32),
            valid=jnp.zeros((num_frames, passes, t_total, k), bool),
            age=jnp.full((num_frames,), jnp.iinfo(jnp.int32).max // 2,
                         jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    scene: Scene
    opt_state_bg: Any
    stats_bg: density.DensifyStats
    opt_state_actors: Any | None = None
    stats_actors: density.DensifyStats | None = None
    key: Array = dataclasses.field(
        default_factory=lambda: jax.random.key(0))
    bins: BinCache | None = None


def init_train_state(scene: Scene, opt_args, seed: int = 0
                     ) -> tuple[TrainState, optax.GradientTransformation,
                                optax.GradientTransformation | None]:
    opt_bg = optim.asset_optimizer(opt_args, scene.background.extent)
    state = TrainState(
        scene=scene,
        opt_state_bg=opt_bg.init(scene.background.params()),
        stats_bg=density.DensifyStats.zero(scene.background.capacity),
        key=jax.random.key(seed),
    )
    opt_ac = None
    if scene.actors is not None:
        opt_ac = optim.asset_optimizer(opt_args, scene.actors.extent)
        state.opt_state_actors = opt_ac.init(scene.actors.params())
        m, a = scene.actors.xyz.shape[:2]
        state.stats_actors = density.DensifyStats.zero(m * a)
    return state, opt_bg, opt_ac


def make_train_step(frames: LiDARFrames, args,
                    trace_cfg: tracer_lib.TraceConfig, opt_bg, opt_ac,
                    rebin_every: int = 0):
    """Build the jitted training step closure.

    rebin_every > 0 enables rebin-interval amortization: the step renders
    with the frame's cached tile assignment (state.bins) and re-bins it only
    when its age reaches `rebin_every` GLOBAL optimizer steps (lax.cond —
    the binning work is skipped entirely on cache hits).  The Trainer
    invalidates the cache at every densify / opacity-reset event, so
    staleness is bounded by min(rebin_every steps, one densification
    interval) regardless of the scene's frame count.
    """
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
    cd_stride = max(1, (frames.height * frames.width)
                    // int(getattr(args.opt, "cd_max_points", 16384)))
    grid, width = frames.grid, frames.width

    def loss_fn(params_bg, params_ac, probe, batch: FrameBatch, scene: Scene,
                assignment=None):
        # assignment: None, a TileAssignment, or (tail training) a list of
        # tail_passes + 1 of them — passed through to the tracer.
        bg = scene.background.with_params(params_bg)
        sc = dataclasses.replace(scene, background=bg)
        if params_ac is not None:
            sc = dataclasses.replace(
                sc, actors=scene.actors.with_params(params_ac))
        bundle, _ = compose(sc, batch.frame)
        # World-mean gradient probe for densification stats.
        bundle = bundle._replace(means=bundle.means + probe)
        out = tracer_lib.render_frame(
            bundle, grid, width, batch.sensor2world,
            sc.background.active_sh_degree, trace_cfg, use_rayhit,
            assignment=assignment)

        cd = None
        if use_cd:
            from lidar_rt_tpu.core import rays as rays_lib
            origin, dirs3 = rays_lib.range_rays(grid, width,
                                                batch.sensor2world)
            dirs_f = dirs3.reshape(-1, 3)[::cd_stride]
            m = batch.gt_mask.reshape(-1)[::cd_stride]
            pred = origin + dirs_f * out["depth"].reshape(-1)[
                ::cd_stride, None]
            gt = origin + dirs_f * batch.gt_depth.reshape(-1)[
                ::cd_stride, None]
            cd = losses.chamfer_loss(pred, m, gt, m)

        reg = losses.box_reg_loss(sc.background, None)
        if params_ac is not None:
            reg = reg + jnp.sum(jax.vmap(losses.box_reg_loss)(
                sc.actors, sc.tracks))

        lb = losses.render_losses(out["depth"], out["intensity"],
                                  out["raydrop"], batch.gt_depth,
                                  batch.gt_intensity, batch.gt_mask, lw,
                                  cd_loss=cd, reg_loss=reg)
        aux = {"accum_weights": out["accum_weights"], "breakdown": lb,
               "depth": out["depth"]}
        return lb.total, aux

    # Cache-aware binning: re-bin with padded footprints on stale frames,
    # reuse the cached assignment otherwise.  The integer-sample existence
    # cull keeps a tight margin (snap_pad_px) — the wide tile-overlap pad
    # would make it vacuous, and measured inter-rebin drift is < 1 px.
    bin_tile = dataclasses.replace(trace_cfg.tile,
                                   pad_px=max(trace_cfg.tile.pad_px, 2.0),
                                   snap_pad_px=0.5)

    tail = int(trace_cfg.tail_passes)
    n_passes = tail + 1

    def _assignment_from_cache(state: TrainState, batch: FrameBatch):
        """Cached tail-chain assignments: (list of) TileAssignment.

        With tail_passes > 0 the whole disjoint chain is binned together
        on stale frames (ops/tracer.bin_tail_chain) and reused otherwise
        — tail training costs no extra binning on cache hits, and the
        later passes' mostly-empty tiles skip all their kernel chunks.
        """
        f = batch.frame
        bins = state.bins
        stale = bins.age[f] >= rebin_every

        def fresh():
            bundle, _ = compose(state.scene, f)
            chain = tracer_lib.bin_tail_chain(
                bundle, grid, width,
                transforms.invert_se3(batch.sensor2world),
                bin_tile, tail)
            return (jnp.stack([a.index.astype(jnp.int32) for a in chain]),
                    jnp.stack([a.valid for a in chain]))

        idx, val = jax.lax.cond(
            stale, fresh, lambda: (bins.index[f], bins.valid[f]))
        t_total = idx.shape[1]
        # Ages advance for EVERY frame each step (global-step staleness):
        # parameter drift is per optimizer step, not per render of the same
        # frame, so a 50-frame scene must not wait 50x longer between
        # rebins of a frame than a 4-frame scene does.
        new_bins = BinCache(
            index=bins.index.at[f].set(idx),
            valid=bins.valid.at[f].set(val),
            age=(bins.age + 1).at[f].set(jnp.where(stale, 1,
                                                   bins.age[f] + 1)))

        def mk(p):
            return TileAssignment(
                index=idx[p], valid=val[p],
                truncated=jnp.zeros((t_total,), jnp.int32))

        assignment = mk(0) if n_passes == 1 else [mk(p)
                                                  for p in range(n_passes)]
        return assignment, new_bins

    @jax.jit
    def train_step(state: TrainState, batch: FrameBatch) -> tuple[
            TrainState, dict]:
        scene = state.scene
        params_bg = scene.background.params()
        params_ac = scene.actors.params() if scene.actors is not None else None
        probe = jnp.zeros((scene.total_capacity, 3))

        assignment, new_bins = (None, state.bins)
        if rebin_every:
            assignment, new_bins = _assignment_from_cache(state, batch)

        argnums = (0, 2) if params_ac is None else (0, 1, 2)
        grads_and_aux = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True)(
            params_bg, params_ac, probe, batch, scene, assignment)
        (loss, aux), grads = grads_and_aux
        if params_ac is None:
            g_bg, g_probe = grads
            g_ac = None
        else:
            g_bg, g_ac, g_probe = grads

        upd, opt_state_bg = opt_bg.update(g_bg, state.opt_state_bg, params_bg)
        new_bg = scene.background.with_params(
            optax.apply_updates(params_bg, upd))
        new_scene = dataclasses.replace(scene, background=new_bg)

        opt_state_ac = state.opt_state_actors
        if params_ac is not None:
            upd_ac, opt_state_ac = opt_ac.update(g_ac, state.opt_state_actors,
                                                 params_ac)
            new_scene = dataclasses.replace(
                new_scene,
                actors=scene.actors.with_params(
                    optax.apply_updates(params_ac, upd_ac)))

        # Densification stats from the probe gradient + visibility.
        parts_g = split_by_asset(scene, g_probe)
        parts_w = split_by_asset(scene, aux["accum_weights"])
        stats_bg = state.stats_bg.add(parts_g[0], parts_w[0] > 0)
        stats_ac = state.stats_actors
        if stats_ac is not None:
            g_flat = jnp.concatenate(parts_g[1:], axis=0)
            w_flat = jnp.concatenate(parts_w[1:], axis=0)
            stats_ac = stats_ac.add(g_flat, w_flat > 0)

        new_state = TrainState(
            scene=new_scene, opt_state_bg=opt_state_bg, stats_bg=stats_bg,
            opt_state_actors=opt_state_ac, stats_actors=stats_ac,
            key=state.key, bins=new_bins)
        bd = aux["breakdown"]
        metrics = {"loss": loss, "depth": bd.depth,
                   "intensity": bd.intensity, "raydrop": bd.raydrop,
                   "cd": bd.cd, "reg": bd.reg}
        return new_state, metrics

    return train_step


def frame_batch(frames: LiDARFrames, f: int) -> FrameBatch:
    return FrameBatch(
        frame=jnp.asarray(f, jnp.int32),
        sensor2world=frames.pose(f),
        gt_depth=frames.depth(f),
        gt_intensity=frames.intensity(f),
        gt_mask=frames.mask(f))


def make_train_step_n(frames: LiDARFrames, step_fn):
    """Scan a whole span of training steps in ONE dispatch.

    Per-call host cost through the device tunnel is ~1.4 ms base plus
    per-leaf handle marshalling and the ground-truth image upload — at
    Waymo scan sizes that was 3x the device time of the step itself.
    Here the frame stacks live on the device once and the host passes only
    (state, frame_ids (n,)); python-side schedule work (densify, SH
    warmup, logging) happens between chunks (Trainer.run aligns chunk
    boundaries to schedule events).

    Returns step_n(state, frame_ids) -> (state, stacked metrics (n, ...)).
    """
    poses = jnp.asarray(np.asarray(frames.sensor2world), jnp.float32)
    r1 = jnp.asarray(np.asarray(frames.range1), jnp.float32)
    i1 = jnp.asarray(np.asarray(frames.intensity1), jnp.float32)

    @jax.jit
    def step_n(state: TrainState, frame_ids: Array):
        def body(s, f):
            batch = FrameBatch(frame=f, sensor2world=poses[f],
                               gt_depth=r1[f], gt_intensity=i1[f],
                               gt_mask=r1[f] != 0)
            return step_fn(s, batch)

        return jax.lax.scan(body, state, frame_ids)

    return step_n


class Trainer:
    """Python-side schedule orchestration (train.py:125-380)."""

    def __init__(self, scene: Scene, frames: LiDARFrames, args,
                 trace_cfg: tracer_lib.TraceConfig | None = None,
                 seed: int | None = None,
                 warmup_cfg: tracer_lib.TraceConfig | None = None,
                 warmup_until: int | None = None):
        """warmup_cfg/warmup_until: optional candidate-budget schedule.

        Early training has huge splat footprints (init scales, pre-prune):
        each RAY's overlap count exceeds a steady-state K budget and the
        truncation permanently degrades convergence.  The reference handles
        this with unbounded k-buffer re-launches (forward.cu:282-291); the
        static-shape TPU analogue is a two-phase budget — a large-K
        warmup config until `warmup_until` (default: densify_until_iter,
        when pruning has normalized footprints), then the steady-state
        `trace_cfg`.  Costs exactly one extra compile at the switch.
        """
        self.frames = frames
        self.args = args
        # Default = the flagship configuration (ops/tracer.FLAGSHIP_TILE).
        self.trace_cfg = trace_cfg or tracer_lib.TraceConfig()
        seed = int(args.get("seed", 1)) if seed is None else seed
        random.seed(seed)
        np.random.seed(seed)
        self.rebin_every = int(getattr(args.opt, "rebin_interval", 0))
        self.state, self.opt_bg, self.opt_ac = init_train_state(
            scene, args.opt, seed)
        self._main_step = self._make_step(self.trace_cfg)
        self.warmup_until = 0
        if warmup_cfg is not None:
            self.warmup_until = (int(args.opt.densify_until_iter)
                                 if warmup_until is None else warmup_until)
            self._warmup_step = self._make_step(warmup_cfg)
            self._warmup_cfg = warmup_cfg
        self.step_fn = (self._warmup_step if self.warmup_until
                        else self._main_step)
        if self.rebin_every:
            self.state.bins = self._fresh_bins(
                warmup_cfg if self.warmup_until else self.trace_cfg)
        self._step_n = None   # built lazily per active step_fn
        self._frame_stack: list[int] = []
        self.iteration = 0
        self.history: list[dict] = []
        # Device-side stacked metrics awaiting host transfer: list of
        # (first_iteration, stacked dict).  Fetching is deferred to log
        # events so chunked dispatches keep pipelining asynchronously
        # (a per-chunk float() would sync at every chunk boundary).
        self._pending_metrics: list[tuple[int, dict]] = []
        self.densify_log: list[dict] = []  # per-pass counts (train.py:450+)
        self.snapshot_dir: str | None = None  # set to enable NaN dumps
        self._elapsed_total = 0.0   # training wall time across run() calls

    def _make_step(self, cfg: tracer_lib.TraceConfig):
        """Build the jitted step for one trace config.  Subclass hook: the
        multi-chip trainer (parallel/trainer.py) swaps in the sharded
        step while reusing this class's whole schedule."""
        return make_train_step(self.frames, self.args, cfg, self.opt_bg,
                               self.opt_ac, self.rebin_every)

    def _sample_ids(self, n: int) -> Array:
        """Frame ids for n consecutive iterations: (n,) int32.  Subclass
        hook: the multi-chip trainer returns (n, dp) batches."""
        return jnp.asarray([self._next_frame() for _ in range(n)],
                           jnp.int32)

    def _fresh_bins(self, cfg: tracer_lib.TraceConfig) -> BinCache:
        tiles_y, tiles_x = cfg.tile.num_tiles(self.frames.height,
                                              self.frames.width)
        return BinCache.stale(self.frames.num_frames, tiles_y * tiles_x,
                              cfg.tile.max_per_tile,
                              passes=cfg.tail_passes + 1)

    def _invalidate_bins(self) -> None:
        """Mark every cached assignment stale (the surfel set changed:
        densify clone/split/prune or opacity reset)."""
        if self.state.bins is not None:
            self.state.bins = self.state.bins._replace(
                age=jnp.full_like(self.state.bins.age,
                                  jnp.iinfo(jnp.int32).max // 2))

    def _next_frame(self) -> int:
        if not self._frame_stack:
            self._frame_stack = list(self.frames.train_frames
                                     or range(self.frames.num_frames))
            random.shuffle(self._frame_stack)
        return self._frame_stack.pop()

    # Iterations scanned per dispatch when no schedule event intervenes.
    # Through the device tunnel each dispatch costs ~1.4 ms base plus
    # per-leaf marshalling + GT upload — 3x the device step time at Waymo
    # scan sizes — so chunking multiplies training throughput.  One value
    # => one extra compile (lax.scan length is static).
    CHUNK = 20

    def _next_event(self, it: int, hard_end: int, log_every: int) -> int:
        """Earliest iteration > it needing python-side schedule work."""
        opt_cfg = self.args.opt

        def nm(interval):
            return (it // interval + 1) * interval

        cands = [hard_end, nm(int(opt_cfg.sh_increase_interval)),
                 nm(log_every)]
        if it < int(opt_cfg.densify_until_iter):
            cands.append(nm(int(opt_cfg.densification_interval)))
            cands.append(nm(int(opt_cfg.opacity_reset_interval)))
            cands.append(int(opt_cfg.densify_until_iter))
        if self.warmup_until:
            cands.append(self.warmup_until)
        return min(c for c in cands if c > it)

    def run(self, iterations: int | None = None,
            log_every: int = 100) -> list[dict]:
        opt_cfg = self.args.opt
        total = iterations or int(opt_cfg.iterations)
        t0 = time.time()
        local = 0
        while local < total:
            hard_end = self.iteration + (total - local)
            free = self._next_event(self.iteration, hard_end,
                                    log_every) - self.iteration
            if free > self.CHUNK:
                # Whole chunk strictly before the next schedule event:
                # one dispatch, python sees only the final metrics.
                if self._step_n is None:
                    self._step_n = make_train_step_n(self.frames,
                                                     self.step_fn)
                ids = self._sample_ids(self.CHUNK)
                self.state, m_stack = self._step_n(self.state, ids)
                self._pending_metrics.append((self.iteration + 1, m_stack))
                self.iteration += self.CHUNK
                local += self.CHUNK
                continue

            self.iteration += 1
            local += 1
            it = self.iteration

            if it % int(opt_cfg.sh_increase_interval) == 0:
                self.state.scene = self.state.scene.one_up_sh_degree()

            if self.warmup_until and it > self.warmup_until:
                self.step_fn = self._main_step
                self._step_n = None
                self.warmup_until = 0
                if self.rebin_every:
                    # The steady-state config may tile differently: new
                    # cache shape, everything stale.
                    self.state.bins = self._fresh_bins(self.trace_cfg)

            # Single step, also via the device-resident scan (length 1 —
            # its own one-time compile): avoids re-uploading GT images and
            # keeps dispatch cost flat near schedule events.
            if self._step_n is None:
                self._step_n = make_train_step_n(self.frames, self.step_fn)
            ids1 = self._sample_ids(1)
            self.state, m_stack = self._step_n(self.state, ids1)
            self._pending_metrics.append((it, m_stack))

            if it < int(opt_cfg.densify_until_iter):
                if (it > int(opt_cfg.densify_from_iter)
                        and it % int(opt_cfg.densification_interval) == 0):
                    self._densify(it)
                if it % int(opt_cfg.opacity_reset_interval) == 0:
                    self._reset_opacity()

            if it % log_every == 0 or local == total:
                self._flush_metrics()
                m = {k: v for k, v in self.history[-1].items()
                     if k != "iteration"}
                # failure detection: snapshot + raise on non-finite loss
                # (the reference's snapshot_fw.dump equivalent)
                if self.snapshot_dir is not None:
                    from lidar_rt_tpu.utils import profiling
                    profiling.guard_finite(
                        m, self.state,
                        f"{self.snapshot_dir}/snapshot_it{it}.npz",
                        context=f"iteration {it}")
                self.history[-1].update(
                    alive=int(self.state.scene.background.num_alive),
                    elapsed=self._elapsed_total + time.time() - t0)
        self._flush_metrics()
        self._elapsed_total += time.time() - t0
        return self.history

    def _flush_metrics(self) -> None:
        """Move pending device-side metric stacks into `history`.

        Every training iteration gets its own entry (the reference records
        each iteration, train.py:263-269); chunked dispatches already
        compute the per-step stack device-side, so this is one transfer per
        chunk, deferred to log events to keep dispatches pipelined."""
        for start, m_stack in self._pending_metrics:
            host = jax.device_get(m_stack)
            n = len(next(iter(host.values())))
            for j in range(n):
                entry = {k: float(v[j]) for k, v in host.items()}
                entry["iteration"] = start + j
                self.history.append(entry)
        self._pending_metrics.clear()

    def _densify(self, it: int) -> None:
        opt_cfg = self.args.opt
        use_size = it > int(opt_cfg.opacity_reset_interval)
        st = self.state
        key, k_bg, k_ac = jax.random.split(st.key, 3)
        bg, ost, stats, counts = density.densify_and_prune(
            st.scene.background, st.opt_state_bg, st.stats_bg, k_bg,
            grad_threshold=float(opt_cfg.densify_grad_threshold),
            scale_threshold=float(opt_cfg.densify_scale_threshold)
            * st.scene.background.extent,
            opacity_threshold=float(opt_cfg.thresh_opa_prune),
            prune_size_threshold=(float(opt_cfg.prune_size_threshold)
                                  if use_size else None),
            track=None)
        st.scene = dataclasses.replace(st.scene, background=bg)
        st.opt_state_bg, st.stats_bg, st.key = ost, stats, key
        self.densify_log.append(
            {"iteration": it, "asset": "background",
             **{k: int(v) for k, v in counts._asdict().items()}})

        if st.scene.actors is not None:
            self._densify_actors(k_ac, use_size)
        self._invalidate_bins()

    def _densify_actors(self, key: Array, use_size: bool) -> None:
        """Per-actor densification: each actor is an independent model, as
        in the reference (one GaussianModel per actor, densified and pruned
        against its own box, gaussian_model.py:378-403).  Clone/split
        children stay in their actor's slot range, the outside-box prune
        runs per actor for any m, and the Adam-moment surgery sees the
        per-actor (a, ...) leaf layout it expects."""
        opt_cfg = self.args.opt
        st = self.state
        actors = st.scene.actors
        m, a = actors.xyz.shape[:2]
        keys = jax.random.split(key, m)

        def pick(tree, i):
            return jax.tree.map(
                lambda x: x[i] if hasattr(x, "shape") and x.ndim >= 1
                and x.shape[0] == m else x, tree)

        def stack(template, parts):
            return jax.tree.map(
                lambda orig, *xs: jnp.stack(xs)
                if hasattr(orig, "shape") and orig.ndim >= 1
                and orig.shape[0] == m else xs[0],
                template, *parts)

        stats_m = jax.tree.map(
            lambda x: x.reshape((m, a) + x.shape[1:]), st.stats_actors)

        assets, opts, stats, totals = [], [], [], None
        for i in range(m):
            new_a, new_o, new_s, counts = density.densify_and_prune(
                pick(actors, i), pick(st.opt_state_actors, i),
                pick(stats_m, i), keys[i],
                grad_threshold=float(opt_cfg.densify_grad_threshold),
                scale_threshold=float(opt_cfg.densify_scale_threshold)
                * actors.extent,
                opacity_threshold=float(opt_cfg.thresh_opa_prune),
                prune_size_threshold=(float(opt_cfg.prune_size_threshold)
                                      if use_size else None),
                track=pick(st.scene.tracks, i))
            assets.append(new_a)
            opts.append(new_o)
            stats.append(new_s)
            totals = counts if totals is None else density.DensifyCounts(
                *(x + y for x, y in zip(totals, counts)))

        st.scene = dataclasses.replace(st.scene,
                                       actors=stack(actors, assets))
        st.opt_state_actors = stack(st.opt_state_actors, opts)
        st.stats_actors = jax.tree.map(
            lambda x: x.reshape((m * a,) + x.shape[2:]),
            stack(stats_m, stats))
        self.densify_log.append(
            {"iteration": self.iteration, "asset": "actors",
             **{k: int(v) for k, v in totals._asdict().items()}})

    def _reset_opacity(self) -> None:
        st = self.state
        bg, ost = density.reset_opacity(st.scene.background, st.opt_state_bg)
        st.scene = dataclasses.replace(st.scene, background=bg)
        st.opt_state_bg = ost
        if st.scene.actors is not None:
            ac, osta = density.reset_opacity(st.scene.actors,
                                             st.opt_state_actors)
            st.scene = dataclasses.replace(st.scene, actors=ac)
            st.opt_state_actors = osta
        self._invalidate_bins()

    def render_eval(self, frame: int) -> dict[str, Array]:
        # Jitted once; frame index and pose are traced so periodic in-
        # training eval (cli.py testing_iterations) costs one compile, not
        # an eager tracer dispatch per frame (same pattern as
        # eval/runner.py).
        if not hasattr(self, "_render_eval_jit"):
            def _render(scene, frame, pose):
                bundle, _ = compose(scene, frame)
                return tracer_lib.render_frame(
                    bundle, self.frames.grid, self.frames.width, pose,
                    scene.background.active_sh_degree, self.trace_cfg,
                    bool(self.args.opt.use_rayhit))
            self._render_eval_jit = jax.jit(_render)
        return self._render_eval_jit(self.state.scene,
                                     jnp.asarray(frame, jnp.int32),
                                     self.frames.pose(frame))
