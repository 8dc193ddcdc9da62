"""Per-group Adam with the reference's learning-rate schedule, in optax.

Reference training_setup (lib/scene/gaussian_model.py:186-213): one Adam
(eps 1e-15) with six parameter groups; xyz uses an exponential log-lerp decay
scaled by the asset's spatial extent (get_expon_lr_func,
lib/utils/general_utils.py:30-63), other groups are constant.

Here each GaussianAsset gets an `optax.multi_transform` keyed by the same
group names over the asset's params() dict, so optimizer-state surgery under
densify/prune is a pure index-gather on the optax moment pytrees
(see train/density.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def expon_lr_schedule(lr_init: float, lr_final: float,
                      lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                      max_steps: int = 1_000_000) -> optax.Schedule:
    """Log-linear interpolation lr_init -> lr_final with optional sine-eased
    warm-up delay (reference general_utils.py:30-63)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t)
                           + jnp.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule


ADAM_EPS = 1e-15  # gaussian_model.py:205


def asset_optimizer(opt_args, spatial_lr_scale: float
                    ) -> optax.GradientTransformation:
    """Optimizer over one asset's params() dict.

    opt_args: config node with the reference's LR hyperparameters
    (configs/base.yaml:11-19); spatial_lr_scale: the asset extent
    (gaussian_model.py:156,202).
    """
    xyz_sched = expon_lr_schedule(
        lr_init=opt_args.position_lr_init * spatial_lr_scale,
        lr_final=opt_args.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=opt_args.position_lr_max_steps,
    )

    def adam(lr) -> optax.GradientTransformation:
        return optax.adam(lr, eps=ADAM_EPS)

    return optax.multi_transform(
        {
            "xyz": adam(xyz_sched),
            "f_dc": adam(opt_args.feature_lr),
            "f_rest": adam(opt_args.feature_lr / 20.0),
            "opacity": adam(opt_args.opacity_lr),
            "scaling": adam(opt_args.scaling_lr),
            "rotation": adam(opt_args.rotation_lr),
        },
        param_labels={k: k for k in
                      ("xyz", "f_dc", "f_rest", "opacity", "scaling",
                       "rotation")},
    )
