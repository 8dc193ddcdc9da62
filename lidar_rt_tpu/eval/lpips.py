"""LPIPS (AlexNet backbone) in pure JAX.

Replaces the reference's `lpips.LPIPS(net="alex")` (eval.py:75,298-304) and
the vendored lpipsPyTorch package (lib/utils/lpipsPyTorch/modules/*.py).
The metric is the standard Zhang et al. construction: AlexNet conv features
after each ReLU, channel-unit-normalized, squared differences, 1x1 "lin"
convs, spatial mean, summed over the five stages.

Pretrained weights cannot be downloaded in this environment (zero egress),
so the weights are loaded from a local `.npz` whose path comes from the
`LIDAR_RT_LPIPS_WEIGHTS` environment variable (or an explicit argument).
The file holds torch-layout arrays:

    conv{i}_w (O, I, kh, kw), conv{i}_b (O,)   for i in 0..4  (AlexNet
        features convs: 64/192/384/256/256 channels, 11/5/3/3/3 kernels)
    lin{i}_w  (1, C_i, 1, 1)                    LPIPS linear heads

`convert_torch_checkpoints` builds that npz from the torchvision
`alexnet` state dict + the richzhang `alex.pth` lin weights, so parity is
one file drop away.  Without weights, eval reports lpips = nan, exactly as
round 1 did.

Inputs follow the reference call convention (eval.py:300-304,328-332):
images are passed clamped-but-unscaled with ``normalize=True`` semantics,
i.e. the net sees ``2 * x - 1``; single-channel range/intensity images are
replicated to 3 channels.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

ENV_VAR = "LIDAR_RT_LPIPS_WEIGHTS"

# AlexNet features: (out_ch, kernel, stride, padding, pool_before)
_CONVS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
N_CHANNELS = [64, 192, 384, 256, 256]

# Input z-score constants (lpipsPyTorch/modules/networks.py:40-43).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(key: Array, dtype=jnp.float32) -> dict[str, Array]:
    """Random parameters with the real topology (test / smoke use)."""
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_CONVS):
        key, k1, k2 = jax.random.split(key, 3)
        params[f"conv{i}_w"] = jax.random.normal(
            k1, (out_ch, in_ch, k, k), dtype) * (1.0 / (k * k * in_ch) ** 0.5)
        params[f"conv{i}_b"] = jnp.zeros((out_ch,), dtype)
        params[f"lin{i}_w"] = jnp.abs(jax.random.normal(
            k2, (1, out_ch, 1, 1), dtype)) * 0.01
        in_ch = out_ch
    return params


def _features(params: dict[str, Array], x: Array) -> list[Array]:
    """AlexNet conv features after each ReLU (N, C, H, W) input in [-1, 1]."""
    x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    feats = []
    for i, (_, _, stride, pad, pool_before) in enumerate(_CONVS):
        if pool_before:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}_w"], (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + params[f"conv{i}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    return x / (jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)) + eps)


@partial(jax.jit, static_argnames=())
def lpips(params: dict[str, Array], x: Array, y: Array) -> Array:
    """LPIPS distance between (N, 3, H, W) images in [-1, 1]."""
    fx = _features(params, x)
    fy = _features(params, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{i}_w"]
        total = total + jnp.mean(jnp.sum(d * w[:, :, 0, 0][..., None, None],
                                         axis=1), axis=(-2, -1))
    return total


def make_lpips_fn(params: dict[str, Array] | None = None,
                  weights_path: str | None = None):
    """-> callable(pred (H, W), gt (H, W)) -> float, or None if no weights.

    Resolution order: explicit params > weights_path > $LIDAR_RT_LPIPS_WEIGHTS.
    The callable mirrors the reference convention (normalize=True on raw
    clamped images; gray replicated to RGB)."""
    if params is None:
        path = weights_path or os.environ.get(ENV_VAR, "")
        if not path or not os.path.exists(path):
            return None
        with np.load(path) as z:
            params = {k: jnp.asarray(z[k]) for k in z.files}

    def fn(pred: np.ndarray, gt: np.ndarray) -> float:
        def prep(img):
            a = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
            return jnp.broadcast_to(a[None, None], (1, 3) + a.shape)
        return float(lpips(params, prep(pred), prep(gt))[0])

    return fn


def convert_torch_checkpoints(alexnet_state: dict, lin_state: dict,
                              out_path: str) -> None:
    """Build the npz from torch checkpoints.

    alexnet_state: torchvision `alexnet` state dict (features.{0,3,6,8,10})
    lin_state:     richzhang v0.1 `alex.pth` ({i}.1.weight, as renamed by
                   lpipsPyTorch get_state_dict)
    """
    layer_ids = [0, 3, 6, 8, 10]
    arrs = {}
    for i, lid in enumerate(layer_ids):
        arrs[f"conv{i}_w"] = np.asarray(
            alexnet_state[f"features.{lid}.weight"])
        arrs[f"conv{i}_b"] = np.asarray(
            alexnet_state[f"features.{lid}.bias"])
        key = f"{i}.1.weight" if f"{i}.1.weight" in lin_state \
            else f"lin{i}.model.1.weight"
        arrs[f"lin{i}_w"] = np.asarray(lin_state[key])
    np.savez(out_path, **arrs)


def _load_torch_state(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def main(argv: list[str] | None = None) -> None:
    """Offline weights drop (run on any host with the two checkpoints):

        python -m lidar_rt_tpu.eval.lpips alexnet.pth alex.pth lpips.npz

    `alexnet.pth` is the torchvision AlexNet-ImageNet state dict,
    `alex.pth` the richzhang LPIPS v0.1 linear heads; copy the produced
    npz next to the repo and `export LIDAR_RT_LPIPS_WEIGHTS=.../lpips.npz`.
    Prints a self-check lpips value so a bad drop fails loudly here, not
    as nan columns at eval time (reference always reports LPIPS,
    eval.py:75,298-304)."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("alexnet_pth")
    p.add_argument("lin_pth")
    p.add_argument("out_npz")
    ns = p.parse_args(argv)
    convert_torch_checkpoints(_load_torch_state(ns.alexnet_pth),
                              _load_torch_state(ns.lin_pth), ns.out_npz)
    fn = make_lpips_fn(weights_path=ns.out_npz)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64))
    val = fn(a, np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1))
    if not np.isfinite(val):
        raise SystemExit("self-check lpips is non-finite; bad checkpoint?")
    print(f"wrote {ns.out_npz}  (self-check lpips={val:.4f})")


if __name__ == "__main__":
    main()
