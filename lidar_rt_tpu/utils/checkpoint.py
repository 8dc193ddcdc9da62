"""Checkpoint save/restore for training state.

Equivalent of the reference's tuple-of-tensors pickles
(`GaussianModel.capture/restore` lib/scene/gaussian_model.py:58-109,
`SceneLidar.save` gs_loader.py:236-241, best-checkpoint retention
train.py:328-380), with one structural improvement: because scene capacity
is fixed (alive masks instead of variable point counts), a checkpoint is a
plain pytree snapshot — restore needs no shape surgery.

Format: a single .npz of numpy leaves keyed by pytree path + a pickled
treedef sidecar, all inside one file via numpy's zip container.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any

import jax
import numpy as np


def save(path: str, state: Any, metadata: dict | None = None) -> None:
    """Snapshot any pytree (TrainState, Scene, params dict...) to `path`."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {}
    key_leaves = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
            key_leaves.append(i)
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    payload = {"treedef": pickle.dumps(treedef),
               "metadata": pickle.dumps(metadata or {}),
               "key_leaves": key_leaves}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, __payload__=np.frombuffer(
            pickle.dumps(payload), dtype=np.uint8), **arrays)


def load(path: str) -> tuple[Any, dict]:
    """Restore (pytree, metadata).  Leaves come back as numpy; feed through
    jax.device_put / jnp.asarray lazily at first use."""
    with np.load(path, allow_pickle=False) as z:
        payload = pickle.loads(z["__payload__"].tobytes())
        treedef = pickle.loads(payload["treedef"])
        metadata = pickle.loads(payload["metadata"])
        leaves = [z[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    for i in payload.get("key_leaves", []):
        leaves[i] = jax.random.wrap_key_data(jax.numpy.asarray(leaves[i]))
    return jax.tree.unflatten(treedef, leaves), metadata


_CKPT_RE = re.compile(r"ckpt_it_(\d+)(_good)?\.npz$")


def find_best(model_dir: str) -> str | None:
    """Locate the best retained checkpoint: prefer `*_good` (the reference's
    best-PSNR marker, train.py:351-368), else the highest iteration."""
    if not os.path.isdir(model_dir):
        return None
    best, best_it, best_good = None, -1, False
    for name in os.listdir(model_dir):
        m = _CKPT_RE.search(name)
        if not m:
            continue
        it, good = int(m.group(1)), bool(m.group(2))
        if (good, it) > (best_good, best_it):
            best, best_it, best_good = os.path.join(model_dir, name), it, good
    return best


def retain_best(model_dir: str, iteration: int, state: Any, is_best: bool,
                metadata: dict | None = None) -> str:
    """Save `ckpt_it_N[_good].npz`; when `is_best`, drop stale _good files
    (train.py:351-380's checkpoint GC)."""
    suffix = "_good" if is_best else ""
    path = os.path.join(model_dir, f"ckpt_it_{iteration}{suffix}.npz")
    save(path, state, metadata)
    if is_best:
        for name in os.listdir(model_dir):
            m = _CKPT_RE.search(name)
            if m and m.group(2) and int(m.group(1)) != iteration:
                os.remove(os.path.join(model_dir, name))
    return path
