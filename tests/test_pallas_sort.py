"""Bitonic lane sort primitive (exact per-ray hit ordering support)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_rt_tpu.ops import pallas_sort as ps


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
