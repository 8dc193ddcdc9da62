"""Adaptive density control: clone/split/prune inside fixed capacity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lidar_rt_tpu.config import default_experiment
from lidar_rt_tpu.scene import TrackBuilder, from_points
from lidar_rt_tpu.scene.asset import inverse_sigmoid
from lidar_rt_tpu.train import density, optim


def _asset(n=8, capacity=16, extent=10.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    return from_points(jnp.asarray(pts), jnp.full((n, 3), 0.6),
                       jax.random.key(seed), capacity, extent=extent)


def _opt_and_state(asset):
    args = default_experiment().opt
    opt = optim.asset_optimizer(args, asset.extent)
    return opt, opt.init(asset.params())


def _run(asset, opt_state, stats, **kw):
    defaults = dict(grad_threshold=0.0002, scale_threshold=0.1,
                    opacity_threshold=0.003, prune_size_threshold=None,
                    track=None)
    defaults.update(kw)
    return density.densify_and_prune(asset, opt_state, stats,
                                     jax.random.key(42), **defaults)


class TestStats:
    def test_accumulation(self):
        stats = density.DensifyStats.zero(4)
        grads = jnp.array([[3.0, 4.0, 0.0]] * 4)
        visible = jnp.array([True, False, True, True])
        stats = stats.add(grads, visible)
        np.testing.assert_allclose(np.asarray(stats.grad_accum), 5.0)
        np.testing.assert_allclose(np.asarray(stats.denom), [1, 0, 1, 1])


class TestClone:
    def test_high_grad_small_splat_clones(self):
        asset = _asset()
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        # mark splat 0 as high-gradient
        grads = jnp.zeros((asset.capacity, 3)).at[0, 0].set(1.0)
        stats = stats.add(grads, asset.alive)
        # scale_threshold above every init scale -> the clone branch
        new, state, stats, counts = _run(asset, state, stats,
                                         scale_threshold=100.0)
        assert int(counts.cloned) == 1
        assert int(counts.split) == 0
        assert int(counts.alive) == 9
        # clone landed in a free slot with identical parameters
        clone_rows = np.where(np.asarray(new.alive)[8:])[0] + 8
        assert len(clone_rows) == 1
        np.testing.assert_allclose(np.asarray(new.xyz[clone_rows[0]]),
                                   np.asarray(asset.xyz[0]))

    def test_below_threshold_no_change(self):
        asset = _asset()
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        new, _, _, counts = _run(asset, state, stats)
        assert int(counts.cloned) == 0 and int(counts.split) == 0
        np.testing.assert_array_equal(np.asarray(new.alive),
                                      np.asarray(asset.alive))


class TestSplit:
    def test_high_grad_big_splat_splits(self):
        asset = _asset()
        # make splat 2 large: exp(log_scale) > scale_threshold
        asset = dataclasses.replace(
            asset, log_scale=asset.log_scale.at[2].set(jnp.log(0.5)))
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        grads = jnp.zeros((asset.capacity, 3)).at[2, 0].set(1.0)
        stats = stats.add(grads, asset.alive)
        new, state, stats, counts = _run(asset, state, stats,
                                         scale_threshold=0.1)
        assert int(counts.split) == 1
        # source removed, 2 children added: alive 8 - 1 + 2
        assert int(counts.alive) == 9
        # the killed source slot may be reused for a child; identify children
        # by their shrunken scale instead of slot position
        alive = np.asarray(new.alive)
        ls = np.asarray(new.log_scale[:, 0])
        child_scale = np.log(0.5) - np.log(0.8 * 2)
        assert (np.abs(ls[alive] - child_scale) < 1e-5).sum() == 2
        # the un-shrunk source scale is gone
        assert not np.any(np.abs(ls[alive] - np.log(0.5)) < 1e-5)

    def test_capacity_overflow_drops_children(self):
        asset = _asset(n=15, capacity=16)
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        grads = jnp.zeros((asset.capacity, 3)).at[:15, 0].set(1.0)
        stats = stats.add(grads, asset.alive)
        new, _, _, counts = _run(asset, state, stats,
                                 scale_threshold=100.0)
        assert int(counts.cloned) == 15
        assert int(counts.dropped) == 14  # only 1 free slot
        assert int(counts.alive) == 16


class TestPrune:
    def test_low_opacity_pruned(self):
        asset = _asset()
        asset = dataclasses.replace(
            asset, opacity_logit=asset.opacity_logit.at[1].set(
                float(inverse_sigmoid(jnp.float32(0.001)))))
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        new, _, _, counts = _run(asset, state, stats)
        assert int(counts.pruned) == 1
        assert not bool(new.alive[1])
        assert int(counts.alive) == 7
        # dead slot is a compositing no-op again
        assert float(new.opacity[1]) < 1e-10

    def test_oversized_pruned_when_enabled(self):
        asset = _asset(extent=10.0)
        asset = dataclasses.replace(
            asset, log_scale=asset.log_scale.at[3].set(jnp.log(5.0)))
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        # 0.1 * extent * prune_size_threshold = 0.1*10*0.1 = 0.1 < 5.0
        new, _, _, counts = _run(asset, state, stats,
                                 prune_size_threshold=0.1)
        assert not bool(new.alive[3])

    def test_outside_box_pruned(self):
        asset = _asset(extent=10.0)
        asset = dataclasses.replace(
            asset, xyz=asset.xyz.at[0].set(jnp.array([50.0, 0.0, 0.0])))
        track = TrackBuilder(1, size=(4.0, 4.0, 4.0)).build()
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)
        new, _, _, counts = _run(asset, state, stats,
                                 prune_size_threshold=0.1, track=track)
        assert not bool(new.alive[0])


class TestOptimizerSurgery:
    def test_moments_zeroed_for_spawned_and_killed(self):
        asset = _asset()
        opt, state = _opt_and_state(asset)
        # fabricate nonzero moments everywhere
        state = jax.tree.map(
            lambda n: optax.ScaleByAdamState(
                count=n.count, mu=jax.tree.map(lambda x: x + 1.0, n.mu),
                nu=jax.tree.map(lambda x: x + 1.0, n.nu))
            if isinstance(n, optax.ScaleByAdamState) else n,
            state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        stats = density.DensifyStats.zero(asset.capacity)
        grads = jnp.zeros((asset.capacity, 3)).at[0, 0].set(1.0)
        stats = stats.add(grads, asset.alive)
        asset2 = dataclasses.replace(
            asset, opacity_logit=asset.opacity_logit.at[1].set(
                float(inverse_sigmoid(jnp.float32(0.001)))))
        new, new_state, _, counts = _run(asset2, state, stats,
                                         scale_threshold=100.0)
        mu_xyz = np.asarray(new_state.inner_states["xyz"].inner_state[0].mu["xyz"])
        spawned = np.where(np.asarray(new.alive)[8:])[0] + 8
        assert (mu_xyz[spawned] == 0).all()     # fresh moments for clone
        assert (mu_xyz[1] == 0).all()           # killed slot zeroed
        assert (mu_xyz[0] == 1.0).all()         # survivor untouched

    def test_reset_opacity(self):
        asset = _asset()
        opt, state = _opt_and_state(asset)
        state = jax.tree.map(
            lambda n: optax.ScaleByAdamState(
                count=n.count, mu=jax.tree.map(lambda x: x + 1.0, n.mu),
                nu=jax.tree.map(lambda x: x + 1.0, n.nu))
            if isinstance(n, optax.ScaleByAdamState) else n,
            state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        new, new_state = density.reset_opacity(asset, state)
        assert np.asarray(new.opacity[:8]).max() <= 0.01 + 1e-6
        # dead slots untouched
        assert float(new.opacity_logit[8]) == pytest.approx(-30.0)
        mu_op = np.asarray(
            new_state.inner_states["opacity"].inner_state[0].mu["opacity"])
        assert (mu_op == 0).all()
        mu_xyz = np.asarray(
            new_state.inner_states["xyz"].inner_state[0].mu["xyz"])
        assert (mu_xyz == 1.0).all()

    def test_densify_is_jittable(self):
        asset = _asset()
        opt, state = _opt_and_state(asset)
        stats = density.DensifyStats.zero(asset.capacity)

        @jax.jit
        def run(a, s, st):
            return density.densify_and_prune(
                a, s, st, jax.random.key(0), grad_threshold=0.0002,
                scale_threshold=0.1, opacity_threshold=0.003,
                prune_size_threshold=None, track=None)

        new, state2, stats2, counts = run(asset, state, stats)
        assert int(counts.alive) == 8
