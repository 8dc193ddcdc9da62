"""YAML config system with `parent_config` chain inheritance.

Equivalent of the reference's config layer (lib/arguments/__init__.py:9-60):
configs are plain YAML; a `parent_config:` key points at a base file whose
values are recursively merged underneath (child keys win); cycles are
detected.  Train/eval take two files — the experiment config is parsed
first and its values take precedence; the data config then only fills keys
the experiment config didn't set (reference train.py:518-519 with the
first-loaded-wins merge of lib/arguments/__init__.py:32-42).

`Args` is a read-only attribute view over nested dicts with dict-style
fallbacks, so hyperparameters read as `args.opt.lambda_depth_l1`.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml


class Args:
    """Recursive attribute view over a config dict."""

    def __init__(self, d: dict):
        self._d = {}
        for k, v in d.items():
            self._d[k] = Args(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._d[name]
        except KeyError as e:
            raise AttributeError(
                f"config has no key {name!r}; available: "
                f"{sorted(self._d)}") from e

    def __getitem__(self, name: str) -> Any:
        return self._d[name]

    def __contains__(self, name: str) -> bool:
        return name in self._d

    def get(self, name: str, default: Any = None) -> Any:
        return self._d.get(name, default)

    def keys(self):
        return self._d.keys()

    def to_dict(self) -> dict:
        return {k: v.to_dict() if isinstance(v, Args) else v
                for k, v in self._d.items()}

    def __repr__(self) -> str:
        return f"Args({self.to_dict()!r})"


def merge_dicts(base: dict, child: dict) -> dict:
    """Recursive merge; child keys win.  Used for the parent_config chain,
    where the child file overrides its parent — the same net effect as the
    reference's merge loop (lib/arguments/__init__.py:49-58), which loads
    the child first and lets already-present keys win as parents arrive."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def underlay_dicts(base: dict, under: dict) -> dict:
    """Recursive merge where BASE keys win; `under` only fills gaps.

    This is the reference's `merge_configs(dict1, dict2)` exactly
    (lib/arguments/__init__.py:32-42): on a leaf conflict dict1 — the
    already-accumulated args — is returned unchanged.  It is what makes
    `parse(data_cfg, parse(exp_cfg))` (train.py:518-519) give the
    EXPERIMENT config precedence over the data-config chain."""
    out = copy.deepcopy(base)
    for k, v in under.items():
        if k not in out:
            out[k] = copy.deepcopy(v)
        elif isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = underlay_dicts(out[k], v)
    return out


def load_config_dict(path: str, _seen: tuple = ()) -> dict:
    """Load a YAML file, resolving the parent_config chain (child wins)."""
    path = os.path.abspath(path)
    if path in _seen:
        raise ValueError(f"parent_config cycle: {[*_seen, path]}")
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    parent = d.pop("parent_config", None)
    if parent:
        if not os.path.isabs(parent):
            # The reference resolves relative to the CWD (it always runs
            # from the repo root).  Be robust to any CWD: try the config
            # file's directory, then each ancestor (covers repo-root-
            # relative paths like "configs/base.yaml" referenced from
            # configs/exp.yaml), then the CWD.
            base = os.path.dirname(path)
            candidates = []
            cur = base
            while True:
                candidates.append(os.path.join(cur, parent))
                nxt = os.path.dirname(cur)
                if nxt == cur:
                    break
                cur = nxt
            candidates.append(os.path.abspath(parent))
            for cand in candidates:
                if os.path.exists(cand):
                    parent = cand
                    break
            else:
                raise FileNotFoundError(
                    f"parent_config {parent!r} (from {path}) not found; "
                    f"tried {candidates[:3]}...")
        d = merge_dicts(load_config_dict(parent, (*_seen, path)), d)
    return d


def parse(path: str, base: Args | None = None) -> Args:
    """Parse a config file into Args, optionally underlaying it beneath an
    existing Args: `parse(data_cfg, parse(exp_cfg))` (reference
    train.py:518-519) keeps every value the experiment config already set —
    the data-config chain (including any parent defaults it drags in) only
    fills keys the base doesn't have.  Matches the reference's first-loaded-
    wins merge (lib/arguments/__init__.py:32-58)."""
    d = load_config_dict(path)
    if base is not None:
        d = underlay_dicts(base.to_dict(), d)
    return Args(d)


def default_experiment() -> Args:
    """Built-in hyperparameter defaults mirroring the reference's
    configs/base.yaml + configs/exp.yaml so programmatic use needs no files."""
    return Args({
        "seed": 1,
        "model_dir": "output",
        "task_name": "default",
        "exp_name": "exp",
        "dynamic": False,
        "testing_iterations": 1000,
        "saving_iterations": [15000, 20000, 25000, 30000],
        "visual_interval": 1000,
        "model": {
            "voxel_size": 0.15,
            "bkgd_extent_factor": 3,
            "object_extent_factor": 4,
            "obj_pt_num": 10_000,
            "dimension": 2,
            "sh_degree": 3,
            "white_background": False,
        },
        "opt": {
            "iterations": 30_000,
            "position_lr_init": 0.00016,
            "position_lr_final": 0.0000016,
            "position_lr_delay_mult": 0.01,
            "position_lr_max_steps": 30_000,
            "feature_lr": 0.0025,
            "opacity_lr": 0.05,
            "scaling_lr": 0.005,
            "rotation_lr": 0.001,
            "sh_increase_interval": 1000,
            "densification_interval": 100,
            "opacity_reset_interval": 3000,
            "densify_from_iter": 500,
            "densify_until_iter": 15_000,
            "densify_scale_threshold": 0.0002,
            "densify_grad_threshold": 0.0002,
            "densify_weight_threshold": 0.0,
            "prune_size_threshold": 0.1,
            "thresh_opa_prune": 0.003,
            "lambda_cd": 0.01,
            "lambda_depth_l1": 0.1,
            "lambda_intensity_l1": 0.85,
            "lambda_intensity_l2": 0.0,
            "lambda_intensity_dssim": 0.15,
            "lambda_raydrop_bce": 0.01,
            "lambda_reg": 0.01,
            "use_rayhit": True,
            "use_normal_init": True,
            "use_voxel_init": True,
            # Rebin-interval amortization: reuse a frame's cached tile
            # assignment until it is N GLOBAL optimizer steps old (0 = bin
            # every step, the reference's rebuild-the-BVH-every-iteration
            # behavior).  Global steps, not per-frame renders: parameter
            # drift accrues per step, so a 50-frame scene must rebin as
            # often as a 4-frame one.  The cache is invalidated at every
            # densify / opacity-reset event regardless, so staleness never
            # crosses a surfel-set change.
            "rebin_interval": 0,
        },
        "refine": {
            "use_refine": True,
            "use_spatial": True,
            "epochs": 400,
            "batch_size": 16,
            "lr": 0.001,
        },
    })
