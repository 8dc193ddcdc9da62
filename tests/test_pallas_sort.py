"""Bitonic lane sort primitive (exact per-ray hit ordering support)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_rt_tpu.ops import pallas_sort as ps

# Multi-minute interpret-mode kernel tests: excluded from the fast dev
# tier (`pytest -m "not slow"`); the full suite remains the CI gate.
pytestmark = pytest.mark.slow


def _run_kernel(fn, out_shapes, *args):
    return pl.pallas_call(
        fn,
        out_shape=[jax.ShapeDtypeStruct(s, d) for s, d in out_shapes],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in out_shapes],
        interpret=True,
    )(*args)


class TestLaneSort:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_sorts_keys_and_payload(self, seed):
        rng = np.random.default_rng(seed)
        t = rng.uniform(0.5, 80.0, (8, 128)).astype(np.float32)
        valid = rng.uniform(size=(8, 128)) > 0.3
        payload = rng.normal(size=(8, 128)).astype(np.float32)

        def kern(t_ref, v_ref, p_ref, ks_ref, ps_ref):
            key = ps.pack_depth_keys(t_ref[...], v_ref[...] > 0.5)
            k_s, (p_s,) = ps.sort_lanes(key, (p_ref[...],))
            ks_ref[...] = k_s
            ps_ref[...] = p_s

        k_s, p_s = _run_kernel(
            kern, [((8, 128), jnp.int32), ((8, 128), jnp.float32)],
            jnp.asarray(t), jnp.asarray(valid, jnp.float32),
            jnp.asarray(payload))
        k_s, p_s = np.asarray(k_s), np.asarray(p_s)

        # keys ascending per row
        assert (np.diff(k_s.astype(np.int64), axis=1) > 0).all()
        for r in range(8):
            src = k_s[r] & 127
            # valid lanes sorted by depth, before all invalid lanes
            nv = valid[r].sum()
            np.testing.assert_array_equal(
                np.sort(t[r][valid[r]]), np.sort(t[r][src[:nv]]))
            order = t[r][src[:nv]]
            assert (np.diff(order) >= 0).all()
            # payload followed the permutation
            np.testing.assert_array_equal(p_s[r], payload[r][src])

    def test_unsort_inverts(self):
        rng = np.random.default_rng(3)
        t = rng.uniform(0.5, 80.0, (8, 128)).astype(np.float32)
        payload = rng.normal(size=(8, 128)).astype(np.float32)

        def kern(t_ref, p_ref, out_ref):
            key = ps.pack_depth_keys(t_ref[...],
                                     jnp.ones_like(t_ref[...]) > 0.0)
            k_s, (p_s,) = ps.sort_lanes(key, (p_ref[...],))
            (back,) = ps.unsort_lanes(k_s, (p_s,))
            out_ref[...] = back

        (back,) = _run_kernel(kern, [((8, 128), jnp.float32)],
                              jnp.asarray(t), jnp.asarray(payload))
        np.testing.assert_array_equal(np.asarray(back), payload)

    def test_depth_quantization_bound(self):
        # dropping 7 mantissa bits must not reorder depths separated by
        # more than 2^-16 relative
        t = jnp.asarray([[1.0, 1.0 + 2e-4, 2.0, 2.0 * (1 + 2e-4)] * 32],
                        jnp.float32)
        key = ps.pack_depth_keys(t, jnp.ones_like(t) > 0)
        k = np.asarray(key[0]).astype(np.int64) >> 7
        assert k[1] > k[0] and k[3] > k[2]


class TestPairSort:
    """256-lane two-chunk bitonic sort (cross-chunk exact ordering for
    K = 256, reference forward.cu:312-356 global depth order)."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_sorts_across_chunks(self, seed):
        rng = np.random.default_rng(seed)
        t = rng.uniform(0.5, 80.0, (8, 256)).astype(np.float32)
        valid = rng.uniform(size=(8, 256)) > 0.3
        payload = rng.normal(size=(8, 256)).astype(np.float32)

        def kern(t_ref, v_ref, p_ref, k0_ref, k1_ref, p0_ref, p1_ref):
            k0, k1 = ps.pack_depth_keys_pair(
                t_ref[:, :128], v_ref[:, :128] > 0.5,
                t_ref[:, 128:], v_ref[:, 128:] > 0.5)
            (k0s, k1s), ((p0s, p1s),) = ps.sort_lanes_pair(
                k0, k1, ((p_ref[:, :128], p_ref[:, 128:]),))
            k0_ref[...] = k0s
            k1_ref[...] = k1s
            p0_ref[...] = p0s
            p1_ref[...] = p1s

        k0s, k1s, p0s, p1s = _run_kernel(
            kern,
            [((8, 128), jnp.int32), ((8, 128), jnp.int32),
             ((8, 128), jnp.float32), ((8, 128), jnp.float32)],
            jnp.asarray(t), jnp.asarray(valid, jnp.float32),
            jnp.asarray(payload))
        ks = np.concatenate([np.asarray(k0s), np.asarray(k1s)], axis=1)
        pv = np.concatenate([np.asarray(p0s), np.asarray(p1s)], axis=1)

        assert (np.diff(ks.astype(np.int64), axis=1) > 0).all()
        for r in range(8):
            src = ks[r] & 255
            assert sorted(src) == list(range(256))  # a permutation
            nv = valid[r].sum()
            # valid lanes first, in globally ascending depth order (up to
            # the key's 8 dropped mantissa bits: ~2^-16 relative ties)
            order = t[r][src[:nv]]
            np.testing.assert_array_equal(np.sort(t[r][valid[r]]),
                                          np.sort(order))
            order_q = order.view(np.int32) & ~np.int32(255)
            assert (np.diff(order_q) >= 0).all()
            np.testing.assert_array_equal(pv[r], payload[r][src])

    def test_pair_unsort_inverts(self):
        rng = np.random.default_rng(5)
        t = rng.uniform(0.5, 80.0, (8, 256)).astype(np.float32)
        valid = rng.uniform(size=(8, 256)) > 0.2
        payload = rng.normal(size=(8, 256)).astype(np.float32)

        def kern(t_ref, v_ref, p_ref, o0_ref, o1_ref):
            k0, k1 = ps.pack_depth_keys_pair(
                t_ref[:, :128], v_ref[:, :128] > 0.5,
                t_ref[:, 128:], v_ref[:, 128:] > 0.5)
            (k0s, k1s), ((p0s, p1s),) = ps.sort_lanes_pair(
                k0, k1, ((p_ref[:, :128], p_ref[:, 128:]),))
            ((o0, o1),) = ps.unsort_lanes_pair(k0s, k1s, ((p0s, p1s),))
            o0_ref[...] = o0
            o1_ref[...] = o1

        o0, o1 = _run_kernel(
            kern, [((8, 128), jnp.float32), ((8, 128), jnp.float32)],
            jnp.asarray(t), jnp.asarray(valid, jnp.float32),
            jnp.asarray(payload))
        out = np.concatenate([np.asarray(o0), np.asarray(o1)], axis=1)
        np.testing.assert_array_equal(out, payload)
