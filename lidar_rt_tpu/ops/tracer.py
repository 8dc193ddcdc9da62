"""The tiled differentiable surfel tracer — public render entry point.

This is the TPU-native replacement for the reference's entire
diff-lidar-tracer submodule (OptiX BVH + anyhit k-buffer + CUDA compositing,
submodules/diff-lidar-tracer/optix_tracer/forward.cu / backward.cu):

  1. `bin_surfels` lists the K nearest candidates per range-image tile
     (ops/binning.py — replaces GAS build + traversal),
  2. per tile, every (ray, candidate) pair is intersected analytically
     (ops/geometry.py — replaces proxy-triangle anyhit),
  3. hits are alpha-composited front-to-back with the masked
     cumulative-product weights (replaces the sequential 16-deep k-buffer
     loop), optionally re-sorted per ray by exact hit depth,
  4. per-surfel accumulated weights are segment-summed (replaces the
     forward kernel's atomicAdd, forward.cu:272).

Gradients come from JAX autodiff through this whole pipeline (the binning
top-k is non-differentiable and acts as a stop-gradient visibility oracle,
exactly like the reference's BVH).  Tiles are processed in scanned batches
(`tile_batch`) so peak memory is bounded; each batch is rematerialized in
the backward pass (`jax.checkpoint`).

The Pallas kernel path (ops/pallas_tracer.py, when available) implements the
same semantics with fused VMEM compositing; this module is its semantics
reference and fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lidar_rt_tpu.core import rays as rays_lib
from lidar_rt_tpu.core import sh as sh_lib
from lidar_rt_tpu.core import transforms
from lidar_rt_tpu.ops import geometry
from lidar_rt_tpu.ops.binning import TileAssignment, TileConfig, bin_surfels
from lidar_rt_tpu.ops.composite import RenderOutputs, SurfelBundle

Array = jax.Array


# ---- The flagship tracer configuration: ONE source of truth. ----
# Adjudicated on-chip by the two-seed Waymo-scale quality ladders
# (LADDER_r03/r04.json, PERF_NOTES).  TraceConfig() defaults to these
# values, and cli._trace_cfg / sim.render_scan / bench.py all read them,
# so the deployment API (re-simulation) renders with the same engine and
# budget the benchmarks report (tests/test_configs.py asserts the three
# surfaces agree).
FLAGSHIP_TILE = TileConfig(tile_h=8, tile_w=128, max_per_tile=256,
                           binner="hier", approx_topk=True)


@dataclass(frozen=True)
class TraceConfig:
    """Static tracer parameters.  Defaults ARE the flagship configuration.

    engine: "jax" (scanned gather compositing, any backend), "pallas"
      (fused Mosaic kernel, TPU), or "auto" — pallas on TPU when the
      tiling satisfies its constraints, jax otherwise.
    exact_order: re-sort candidates per ray by true intersection depth
      (reference k-buffer semantics, forward.cu:312-356).  False keeps the
      tile-global nearest-center order (the 3DGS approximation) — cheaper,
      and the quality-validated flagship default.  The pallas engine sorts
      with an in-kernel bitonic lane sort (ops/pallas_sort.py): exact at
      max_per_tile 128 (one chunk) and at 256 (the cross-chunk 256-lane
      pair sort); "auto" routes exact_order to pallas for those budgets,
      to jax otherwise.
    tile_batch: tiles composited per scan step (jax engine memory knob).
    ray_block: rays per kernel instance (pallas engine VMEM knob).
    """

    tile: TileConfig = FLAGSHIP_TILE
    exact_order: bool = False
    tile_batch: int = 8
    engine: str = "auto"
    ray_block: int = 512
    # Relax the pallas kernels' channel/gradient MXU contractions to
    # 1-pass bf16 (see PallasTraceConfig.fast_math; gated on-chip by
    # scripts/tpu_parity.py --fast + scripts/fast_math_probe.sh,
    # PARITY_r03.json).  Ignored by the jax engine (which stays the f32
    # semantics reference).
    fast_math: bool = True
    # Cache the forward kernel's per-pair gated alpha + exclusive
    # transmittance as bf16 outputs and let the backward decode them
    # instead of replaying the forward (PallasTraceConfig.cache_fwd).
    # Same ~0.4% gradient-rounding tolerance class as fast_math, so it is
    # only effective when fast_math is set; tile-order mode only
    # (exact_order forces a replay regardless).  Ignored by the jax
    # engine.
    cache_fwd: bool = True
    # Unbounded-hit tail: number of re-binned re-trace passes appended to
    # the render.  Each pass re-bins PAST each truncated tile's K-th
    # candidate range (binning min_range) and continues compositing with
    # the per-ray carried transmittance — the reference's chunk re-launch
    # loop (forward.cu:282-291) at whole-image granularity.  Pass p sees
    # candidate ranks pK+1..(p+1)K, so tail_passes=p with budget K equals
    # a single (p+1)K-budget pass under tile-order semantics.  0 = off
    # (training default; truncation is counted in TileAssignment).
    tail_passes: int = 0

    def resolve_engine(self, height: int, width: int,
                       render_width: int | None) -> str:
        if self.engine == "jax":
            return "jax"
        shapes_ok = (
            self.tile.max_per_tile % 128 == 0
            and (self.tile.tile_h * self.tile.tile_w) % self.ray_block == 0
            and self.ray_block % 8 == 0 and self.ray_block <= 512)
        if self.engine == "pallas":
            # Explicit request: honored on every backend (non-TPU runs the
            # Pallas interpreter — how CI exercises the kernel semantics).
            if not shapes_ok:
                raise ValueError(
                    "pallas engine needs max_per_tile % 128 == 0 and "
                    "ray_block dividing the tile ray count")
            return "pallas"
        # auto: compiled pallas on TPU only; exact_order stays on the jax
        # engine unless the kernel's sort covers all candidates (one
        # 128-lane chunk, or two chunks via the 256-lane pair sort).
        pallas_ok = (
            jax.default_backend() == "tpu" and shapes_ok
            and (not self.exact_order
                 or self.tile.max_per_tile in (128, 256)))
        return "pallas" if pallas_ok else "jax"


def _pad_indices(size: int, tile: int, wrap: bool) -> jnp.ndarray:
    """Pixel indices covering `size` padded up to a tile multiple; wrap for
    azimuth (the scan is circular), clamp for rows."""
    padded = -(-size // tile) * tile
    idx = jnp.arange(padded)
    return jnp.mod(idx, size) if wrap else jnp.clip(idx, 0, size - 1)


def _composite_tile(dirs: Array, frames_k: geometry.SurfelFrames,
                    scales_k: Array, opac_k: Array, sh_k: Array,
                    cand_valid: Array, background: Array,
                    active_sh_degree: Array, exact_order: bool,
                    min_depth: Array | None = None,
                    init_trans: Array | None = None) -> tuple[Array, Array]:
    """Composite one tile: rays (R, 3) x K gathered candidates.

    Returns (channels (R, 9), per-candidate weight sums (K,)).
    Channel layout matches the oracle (ops/composite.py) and the reference
    ABI (config.h:19-24).
    """
    hp = jax.lax.Precision.HIGHEST
    # (R, K) intersection products — the MXU-shaped inner products.
    axes = jnp.stack([frames_k.n, frames_k.w1, frames_k.w2], axis=0)  # (3,K,3)
    prods = jnp.einsum("rc,akc->ark", dirs, axes, precision=hp)
    qd, b_u, b_v = prods[0], prods[1], prods[2]

    safe_qd = jnp.where(jnp.abs(qd) > geometry.DENOM_EPS, qd,
                        geometry.DENOM_EPS)
    t = frames_k.p[None, :] / safe_qd
    u = (frames_k.a_u[None, :] + t * b_u) / scales_k[None, :, 0]
    v = (frames_k.a_v[None, :] + t * b_v) / scales_k[None, :, 1]
    g = jnp.exp(-0.5 * (u * u + v * v))
    alpha_raw = jnp.minimum(geometry.ALPHA_MAX, opac_k[None, :] * g)
    t_min = geometry.DEPTH_MIN if min_depth is None else min_depth[:, None]
    valid = ((t >= t_min)
             & (jnp.abs(qd) > geometry.DENOM_EPS)
             & (frames_k.p[None, :] != 0.0)
             & (alpha_raw >= geometry.ALPHA_MIN)
             & cand_valid[None, :])
    alpha = jnp.where(valid, alpha_raw, 0.0)

    if exact_order:
        key = jnp.where(valid, t, jnp.inf)
        perm = jnp.argsort(key, axis=-1)
        alpha_o = jnp.take_along_axis(alpha, perm, axis=-1)
        w_o, final_t = geometry.composite_weights(alpha_o,
                                                  init_trans=init_trans)
        # Scatter weights back to candidate order.
        w = jnp.zeros_like(w_o).at[
            jnp.arange(w_o.shape[0])[:, None], perm].set(w_o)
    else:
        w, final_t = geometry.composite_weights(alpha,
                                                init_trans=init_trans)

    # Per-hit SH colors: (R, 16) basis x (K, 16, 3) -> (R, K, 3) matmul.
    basis = sh_lib.basis(dirs, active_sh_degree)
    colors = jnp.einsum("rs,ksc->rkc", basis, sh_k, precision=hp) + 0.5
    colors = colors.at[..., 0].max(0.0)   # intensity clamp (forward.cu:108)

    color_out = (jnp.einsum("rk,rkc->rc", w, colors, precision=hp)
                 + final_t[:, None] * background[None, :])
    depth_out = jnp.sum(w * t, axis=-1)
    accum_out = jnp.sum(w, axis=-1)
    signed_n = frames_k.n * frames_k.sign[:, None]            # (K, 3)
    normal_out = jnp.einsum("rk,kc->rc", w, signed_n, precision=hp)

    # Ungated raw transmittance (col 9): the tail re-trace carry — the
    # full product including hits the T_MIN live cutoff dropped, so a
    # latched ray carries raw < T_MIN and stays dead in later passes.
    t0_col = jnp.ones_like(depth_out) if init_trans is None else init_trans
    raw_t = t0_col * jnp.prod(1.0 - alpha, axis=-1)
    channels = jnp.concatenate(
        [color_out, depth_out[:, None], accum_out[:, None], normal_out,
         final_t[:, None], raw_t[:, None]], axis=-1)
    return channels, jnp.sum(w, axis=0)


def trace(bundle: SurfelBundle, grid: rays_lib.SensorGrid, width: int,
          sensor2world: Array, background: Array,
          active_sh_degree: Array | int = 3,
          cfg: TraceConfig = TraceConfig(),
          assignment: TileAssignment | None = None,
          col_offset: int = 0, render_width: int | None = None,
          min_depth: Array | None = None,
          init_trans: Array | None = None
          ) -> RenderOutputs:
    """Render a range image: (H, W_r, 9) channels + (N,) accum weights.

    The equivalent of `tracer(ray_o, ray_d, ...)` in the reference render
    bridge (lib/gaussian_renderer/__init__.py:147-160).  `assignment` can be
    precomputed (e.g. shared across returns); by default it is built here —
    note it depends on stop-gradient quantities only.

    col_offset/render_width render only the column band [col_offset,
    col_offset + render_width) — the unit of ray-parallel sharding
    (lidar_rt_tpu.parallel): each chip traces its own azimuth band against
    the replicated surfel set.

    min_depth: optional per-ray (H, W_r) minimum hit range — the multi-
    return mechanism (the reference's chunked re-launch from the last hit
    depth, forward.cu:282-291): render return 1, then re-trace with
    min_depth = first-return depth + gap for return 2.  Supported by both
    engines (the pallas kernel takes it as a per-ray block input).

    init_trans: optional per-ray (H, W_r) initial transmittance — the
    carried state of tail re-trace passes (cfg.tail_passes).
    """
    from lidar_rt_tpu.core import quaternions as quat_lib

    if cfg.tail_passes > 0:
        if assignment is not None and not isinstance(assignment,
                                                     (list, tuple)):
            raise ValueError(
                "tail_passes composites one assignment per pass: pass a "
                "sequence of tail_passes + 1 TileAssignments (e.g. the "
                "trainer's cached chain) or None to re-bin per pass")
        return _trace_tail(bundle, grid, width, sensor2world, background,
                           active_sh_degree, cfg, col_offset, render_width,
                           min_depth, init_trans, assignments=assignment)

    if cfg.resolve_engine(grid.height, width, render_width) == "pallas":
        from lidar_rt_tpu.ops import pallas_tracer
        pcfg = pallas_tracer.PallasTraceConfig(
            tile=cfg.tile, ray_block=cfg.ray_block,
            exact_order=cfg.exact_order, fast_math=cfg.fast_math,
            cache_fwd=(cfg.cache_fwd and cfg.fast_math
                       and not cfg.exact_order))
        return pallas_tracer.trace(bundle, grid, width, sensor2world,
                                   background, active_sh_degree, pcfg,
                                   col_offset, render_width,
                                   min_depth=min_depth,
                                   assignment=assignment,
                                   init_trans=init_trans)

    h, w = grid.height, width
    w_r = w if render_width is None else render_width
    th, tw = cfg.tile.tile_h, cfg.tile.tile_w
    tiles_y, tiles_x = cfg.tile.num_tiles(h, w_r)
    t_total = tiles_y * tiles_x
    n = bundle.means.shape[0]

    world2sensor = transforms.invert_se3(sensor2world)
    if assignment is None:
        assignment = bin_surfels(
            grid, w, jax.lax.stop_gradient(world2sensor),
            jax.lax.stop_gradient(bundle.means),
            jax.lax.stop_gradient(bundle.scales),
            jax.lax.stop_gradient(bundle.opacities), cfg.tile,
            col_offset=col_offset, num_cols=w_r,
            rotations=jax.lax.stop_gradient(bundle.rotations))

    origin, dirs = rays_lib.range_rays(grid, w, sensor2world)
    # Pad to tile multiples (clamp rows, wrap azimuth) and tile:
    row_idx = _pad_indices(h, th, wrap=False)
    col_idx = jnp.mod(col_offset + jnp.arange(-(-w_r // tw) * tw), w)
    dirs_p = dirs[row_idx][:, col_idx]                        # (Hp, Wp, 3)
    dirs_t = (dirs_p
              .reshape(tiles_y, th, tiles_x, tw, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(t_total, th * tw, 3))

    rot = quat_lib.to_rotation_matrix(bundle.rotations)
    frames = geometry.build_frames(bundle.means, rot, origin)

    k = assignment.index.shape[1]
    idx_c = jnp.clip(assignment.index, 0, n - 1)

    if min_depth is not None:
        md_t = (min_depth[row_idx][:, col_idx]
                .reshape(tiles_y, th, tiles_x, tw)
                .transpose(0, 2, 1, 3)
                .reshape(t_total, th * tw))
    else:
        md_t = jnp.full((t_total, th * tw), geometry.DEPTH_MIN)
    if init_trans is not None:
        t0_t = (init_trans[row_idx][:, col_idx]
                .reshape(tiles_y, th, tiles_x, tw)
                .transpose(0, 2, 1, 3)
                .reshape(t_total, th * tw))
    else:
        t0_t = jnp.ones((t_total, th * tw))

    def tile_fn(args):
        dirs_tile, idx, valid, md_tile, t0_tile = args
        frames_k = geometry.SurfelFrames(
            w1=frames.w1[idx], w2=frames.w2[idx], n=frames.n[idx],
            p=frames.p[idx], a_u=frames.a_u[idx], a_v=frames.a_v[idx],
            sign=frames.sign[idx])
        return _composite_tile(
            dirs_tile, frames_k, bundle.scales[idx], bundle.opacities[idx],
            bundle.sh[idx], valid, background, active_sh_degree,
            cfg.exact_order, md_tile, t0_tile)

    # Scan over tile batches; each batch vmapped + rematerialized.
    b = min(cfg.tile_batch, t_total)
    nb = -(-t_total // b)
    pad_t = nb * b - t_total

    def pad_tiles(x):
        return jnp.concatenate([x, x[:1].repeat(pad_t, 0)], 0) if pad_t else x

    xs = (pad_tiles(dirs_t).reshape(nb, b, th * tw, 3),
          pad_tiles(idx_c).reshape(nb, b, k),
          pad_tiles(assignment.valid).reshape(nb, b, k),
          pad_tiles(md_t).reshape(nb, b, th * tw),
          pad_tiles(t0_t).reshape(nb, b, th * tw))

    batch_fn = jax.checkpoint(jax.vmap(tile_fn))

    def scan_body(_, batch):
        return None, batch_fn(batch)

    _, (chans, wsums) = jax.lax.scan(scan_body, None, xs)
    chans = chans.reshape(nb * b, th * tw, 10)[:t_total]
    wsums = wsums.reshape(nb * b, k)[:t_total]

    # Un-tile and crop padding: keep the first occurrence of each pixel.
    hp_, wp_ = tiles_y * th, tiles_x * tw
    img = (chans.reshape(tiles_y, tiles_x, th, tw, 10)
           .transpose(0, 2, 1, 3, 4)
           .reshape(hp_, wp_, 10))[:h, :w_r]

    # Per-surfel accumulated weights (atomicAdd equivalent): wrap-padded
    # tiles re-render duplicated columns, slightly over-counting those
    # surfels' weights — acceptable for the densify-gating use of this
    # output (train.py:218-219).
    flat_idx = jnp.where(assignment.valid, assignment.index, n).reshape(-1)
    accum = jnp.zeros((n,)).at[flat_idx].add(wsums.reshape(-1), mode="drop")

    return RenderOutputs(channels=img[..., :9], accum_weights=accum,
                         raw_trans=img[..., 9])


def _tile_range_cutoff(assignment: TileAssignment, means: Array,
                       world2sensor: Array) -> Array:
    """Per-tile range of the K-th (farthest) selected candidate, or +inf
    where the tile was not truncated (no candidates remain beyond K).

    This is the re-launch depth of tail re-tracing: binning with
    min_range = cutoff yields exactly the candidate ranks the K budget
    dropped (nearest-first selection makes the selected set a range
    prefix).  Candidates whose center range ties the cutoff exactly are
    excluded from both passes — measure-zero for continuous geometry.
    """
    n = means.shape[0]
    r = world2sensor
    p = means @ r[:3, :3].T + r[:3, 3]
    rng = jnp.linalg.norm(p, axis=-1)                       # (N,)
    rng_sel = jnp.where(assignment.valid,
                        rng[jnp.clip(assignment.index, 0, n - 1)],
                        -jnp.inf)                           # (T, K)
    kth = jnp.max(rng_sel, axis=-1)
    return jnp.where(assignment.truncated > 0, kth, jnp.inf)


def bin_tail_chain(bundle: SurfelBundle, grid: rays_lib.SensorGrid,
                   width: int, world2sensor: Array, tile: TileConfig,
                   passes: int, col_offset: int = 0,
                   num_cols: int | None = None) -> list[TileAssignment]:
    """Bin the tail re-trace chain: passes + 1 disjoint assignments, each
    strictly past the previous pass's per-tile K-th candidate range.

    All inputs are treated stop-gradient (binning is the visibility
    oracle).  The chain is what `trace(cfg.tail_passes=p,
    assignment=chain)` consumes — e.g. cached across training steps by
    the trainer's rebin-interval amortization.
    """
    sg = jax.lax.stop_gradient
    w2s = sg(world2sensor)
    chain = []
    min_range = None
    for p in range(passes + 1):
        a = bin_surfels(grid, width, w2s, sg(bundle.means),
                        sg(bundle.scales), sg(bundle.opacities), tile,
                        col_offset=col_offset, num_cols=num_cols,
                        rotations=sg(bundle.rotations),
                        min_range=min_range)
        chain.append(a)
        if p < passes:
            cutoff = _tile_range_cutoff(a, sg(bundle.means), w2s)
            min_range = jnp.maximum(cutoff, min_range) \
                if min_range is not None else cutoff
    return chain


def _trace_tail(bundle: SurfelBundle, grid: rays_lib.SensorGrid, width: int,
                sensor2world: Array, background: Array,
                active_sh_degree: Array | int, cfg: TraceConfig,
                col_offset: int, render_width: int | None,
                min_depth: Array | None,
                init_trans: Array | None,
                assignments=None) -> RenderOutputs:
    """Unbounded-hit tail: chain cfg.tail_passes re-binned passes.

    The reference traces 16-hit chunks and re-launches from the last depth
    until transmittance exhausts (forward.cu:282-291).  Here each pass
    composites the K nearest remaining candidates per tile; the next pass
    re-bins strictly past each truncated tile's K-th candidate range and
    carries the per-ray transmittance (init_trans) and the channel sums.
    Untruncated tiles get min_range = +inf -> zero candidates -> the
    kernel's count predicate skips every chunk, so extra passes are cheap
    when the budget already covered the scene.

    The carried state is the RAW (ungated) transmittance, not the output
    T: a ray stopped by the T_MIN live cutoff must stay stopped in later
    passes (the reference's saturated rays never re-launch), and only
    raw < T_MIN encodes that.  The combined T_out channel comes from the
    telescoping identity T_out = T_0 - sum of all composited weights
    (exact under latching — dropped hits contribute no weight).

    Gradients flow through every pass, including the carried raw
    transmittance (the pallas custom_vjp produces dL/d(init_trans) and
    the kernel backward the per-hit -g_raw*raw/(1-alpha) term).

    assignments: optional precomputed chain of tail_passes + 1
    TileAssignments (built with the same min_range cutoffs — see
    bin_tail_chain); skips the per-pass binning entirely.  This is how
    the trainer's rebin-interval amortization extends to tail training.
    """
    from dataclasses import replace

    cfg0 = replace(cfg, tail_passes=0)
    zero_bg = jnp.zeros_like(background)
    w2s = jax.lax.stop_gradient(transforms.invert_se3(sensor2world))
    sg = jax.lax.stop_gradient
    t0_carry = init_trans
    min_range = None
    chans = None
    accum = None
    if assignments is not None and len(assignments) != cfg.tail_passes + 1:
        raise ValueError(
            f"assignments chain has {len(assignments)} entries for "
            f"{cfg.tail_passes} tail passes (need tail_passes + 1)")
    for p in range(cfg.tail_passes + 1):
        if assignments is not None:
            assignment = assignments[p]
        else:
            assignment = bin_surfels(
                grid, width, w2s, sg(bundle.means), sg(bundle.scales),
                sg(bundle.opacities), cfg.tile, col_offset=col_offset,
                num_cols=render_width,
                rotations=sg(bundle.rotations), min_range=min_range)
        out = trace(bundle, grid, width, sensor2world, zero_bg,
                    active_sh_degree, cfg0, assignment=assignment,
                    col_offset=col_offset, render_width=render_width,
                    min_depth=min_depth, init_trans=t0_carry)
        if chans is None:
            chans, accum = out.channels[..., 0:8], out.accum_weights
        else:
            chans = chans + out.channels[..., 0:8]
            accum = accum + out.accum_weights
        t0_carry = out.raw_trans
        if assignments is None and p < cfg.tail_passes:
            cutoff = _tile_range_cutoff(assignment, sg(bundle.means), w2s)
            min_range = jnp.maximum(cutoff, min_range) \
                if min_range is not None else cutoff

    t0_img = (jnp.ones_like(chans[..., 4]) if init_trans is None
              else init_trans)
    final_t = (t0_img - chans[..., 4])[..., None]
    color = chans[..., 0:3] + final_t * background[None, None, :]
    chans = jnp.concatenate([color, chans[..., 3:8], final_t], axis=-1)
    return RenderOutputs(channels=chans, accum_weights=accum,
                         raw_trans=t0_carry)


def render_frame(bundle: SurfelBundle, grid: rays_lib.SensorGrid, width: int,
                 sensor2world: Array, active_sh_degree: Array | int = 3,
                 cfg: TraceConfig = TraceConfig(), use_rayhit: bool = True,
                 assignment: TileAssignment | None = None
                 ) -> dict[str, Array]:
    """The render-bridge equivalent of `raytracing()` channel decoding
    (lib/gaussian_renderer/__init__.py:163-181): returns depth / intensity /
    raydrop probability / accumulated weights.

    Background = (0, 0, 1): empty rays get ray-drop logit 1 (train.py
    passes bg [0,0,1], train.py:104-106).

    assignment: optional precomputed/cached tile assignment (the trainer's
    rebin-interval amortization).
    """
    background = jnp.array([0.0, 0.0, 1.0])
    out = trace(bundle, grid, width, sensor2world, background,
                active_sh_degree, cfg, assignment=assignment)
    intensity = out.channels[..., 0]
    rayhit_logit = out.channels[..., 1]
    raydrop_logit = out.channels[..., 2]
    depth = out.channels[..., 3]
    if use_rayhit:
        logits = jnp.stack([rayhit_logit, raydrop_logit], axis=-1)
        raydrop_prob = jax.nn.softmax(logits, axis=-1)[..., 1]
    else:
        raydrop_prob = jax.nn.sigmoid(raydrop_logit)
    return {
        "depth": depth,
        "intensity": intensity,
        "raydrop": raydrop_prob,
        "accum_weights": out.accum_weights,
        "channels": out.channels,
    }


def render_multi_return(bundle: SurfelBundle, grid: rays_lib.SensorGrid,
                        width: int, sensor2world: Array,
                        active_sh_degree: Array | int = 3,
                        cfg: TraceConfig = TraceConfig(),
                        use_rayhit: bool = True, return_gap: float = 1.0
                        ) -> tuple[dict[str, Array], dict[str, Array]]:
    """Dual-return rendering (Waymo's two-return range images).

    Return 1 is the standard render; return 2 re-traces each ray with the
    minimum hit range pushed past the first return by `return_gap` meters —
    the analytic analogue of a second laser echo (and of the reference's
    re-launch from the last composited depth, forward.cu:282-291).  The
    tile assignment is binned once and shared by both returns (min_depth
    only re-gates hits; the candidate sets are identical).
    """
    if cfg.tail_passes > 0:
        # Tail re-tracing re-bins per pass — each return runs its own
        # tail chain (min_depth composes: it re-gates hits per pass).
        assignment = None
    else:
        assignment = bin_surfels(
            grid, width, jax.lax.stop_gradient(transforms.invert_se3(
                sensor2world)),
            jax.lax.stop_gradient(bundle.means),
            jax.lax.stop_gradient(bundle.scales),
            jax.lax.stop_gradient(bundle.opacities), cfg.tile,
            rotations=jax.lax.stop_gradient(bundle.rotations))
    r1 = render_frame(bundle, grid, width, sensor2world, active_sh_degree,
                      cfg, use_rayhit, assignment=assignment)
    min2 = jnp.maximum(r1["depth"], 0.0) + return_gap
    background = jnp.array([0.0, 0.0, 1.0])
    out2 = trace(bundle, grid, width, sensor2world, background,
                 active_sh_degree, cfg, min_depth=min2,
                 assignment=assignment)
    if use_rayhit:
        logits = jnp.stack([out2.channels[..., 1], out2.channels[..., 2]],
                           axis=-1)
        drop2 = jax.nn.softmax(logits, axis=-1)[..., 1]
    else:
        drop2 = jax.nn.sigmoid(out2.channels[..., 2])
    r2 = {"depth": out2.channels[..., 3],
          "intensity": out2.channels[..., 0],
          "raydrop": drop2,
          "accum_weights": out2.accum_weights,
          "channels": out2.channels}
    return r1, r2
