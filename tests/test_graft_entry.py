"""Driver entry points: compile check + multi-chip dryrun.

These exercise exactly what the round driver runs: `entry()` must produce
a jittable fn, and `dryrun_multichip(n)` must run one full sharded train
step.  Under the test conftest the backend is already an 8-device virtual
CPU mesh, so dryrun takes the inline path; the subprocess path (used when
the caller holds the real TPU backend) re-executes the same impl.
"""

import jax
import pytest

import __graft_entry__


def test_entry_compiles_and_runs():
    fn, example_args = __graft_entry__.entry()
    out = jax.jit(fn)(*example_args)
    depth, intensity, raydrop = out
    assert depth.ndim == 2 and intensity.shape == depth.shape
    assert bool(jax.numpy.isfinite(depth).all())


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip_inline(n):
    # conftest provisions 8 CPU devices -> inline path for n <= 8.
    __graft_entry__.dryrun_multichip(n)
