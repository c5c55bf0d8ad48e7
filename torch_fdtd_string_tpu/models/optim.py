"""Optimizer / LR-schedule registries (optax).

Counterpart of reference ``src/utils/optimizer.py``: registries keyed by the
``optimizer``/``scheduler`` config groups (sgd, adam, adamw, radam, lamb,
novograd; step, multistep, cosine, *_warmup, noam, plateau, constant).
Gradient all-reduce is handled by jit+sharding (no DDP layer).
"""

from __future__ import annotations

import optax


def get_optimizer(name, conf):
    name = name.lower()
    lr = conf.get("lr", 1e-3)
    if name == "sgd":
        return optax.sgd(
            lr, momentum=conf.get("momentum", 0.9)
        )
    if name == "adam":
        b1, b2 = conf.get("betas", (0.9, 0.999))
        return optax.adam(lr, b1=b1, b2=b2)
    if name == "adamw":
        b1, b2 = conf.get("betas", (0.9, 0.999))
        return optax.adamw(
            lr, b1=b1, b2=b2, weight_decay=conf.get("weight_decay", 0.001)
        )
    if name == "radam":
        return optax.radam(lr)
    if name == "lamb":
        return optax.lamb(lr, weight_decay=conf.get("weight_decay", 0.0))
    if name == "novograd":
        return optax.novograd(lr)
    raise NotImplementedError(name)


def get_schedule(name, base_lr, conf, total_steps=100000):
    """Returns an optax schedule fn: step -> lr multiplier * base_lr."""
    if name is None or name == "constant":
        return lambda step: base_lr
    name = name.lower()
    if name == "noam":
        warmup = conf.get("warmup_steps", 1000)

        def noam(step):
            s = jnp_maximum(step, 1)
            return base_lr * (warmup**0.5) * jnp_minimum(
                s**-0.5, s * warmup**-1.5
            )

        return noam
    if name == "step":
        return optax.exponential_decay(
            base_lr,
            transition_steps=conf.get("step_size", 20),
            decay_rate=conf.get("gamma", 0.99),
            staircase=True,
        )
    if name == "multistep":
        bounds = {int(m): conf.get("gamma", 0.2) for m in conf.get("milestones", [])}
        return optax.piecewise_constant_schedule(base_lr, bounds)
    if name == "cosine":
        return optax.cosine_decay_schedule(
            base_lr, conf.get("T_max", total_steps), alpha=conf.get("eta_min", 1e-6) / base_lr
        )
    if name == "cosine_warmup":
        return optax.warmup_cosine_decay_schedule(
            0.0,
            base_lr,
            conf.get("num_warmup_steps", 500),
            conf.get("num_training_steps", total_steps),
        )
    if name == "linear_warmup":
        w = conf.get("num_warmup_steps", 1000)
        n = conf.get("num_training_steps", total_steps)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, w),
                optax.linear_schedule(base_lr, 0.0, max(n - w, 1)),
            ],
            [w],
        )
    if name == "constant_warmup":
        w = conf.get("num_warmup_steps", 1000)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, w), lambda s: base_lr], [w]
        )
    if name in ("plateau", "timm_cosine"):
        # host-driven plateau handled by the trainer; schedule stays constant
        return lambda step: base_lr
    raise NotImplementedError(name)


def jnp_maximum(a, b):
    import jax.numpy as jnp

    return jnp.maximum(a, b)


def jnp_minimum(a, b):
    import jax.numpy as jnp

    return jnp.minimum(a, b)


def build(opt_name, opt_conf, sch_name, sch_conf, grad_clip=None,
          total_steps=None):
    """Returns (tx, schedule, needs_value).

    ``needs_value=True`` means ``tx.update`` takes a ``value=loss`` kwarg
    (reduce-on-plateau: the torch ReduceLROnPlateau equivalent, driven by the
    training loss instead of an epoch callback).

    ``total_steps`` should be the real run length (epochs x steps/epoch) so
    cosine/linear-warmup schedules decay over the actual horizon.
    """
    base_lr = opt_conf.get("lr", 1e-3)
    schedule = get_schedule(
        sch_name, base_lr, sch_conf or {},
        **({"total_steps": int(total_steps)} if total_steps else {}),
    )
    conf = dict(opt_conf)
    conf["lr"] = schedule
    tx = get_optimizer(opt_name, conf)
    needs_value = False
    if sch_name and sch_name.lower() == "plateau":
        sc = sch_conf or {}
        tx = optax.chain(
            tx,
            optax.contrib.reduce_on_plateau(
                factor=sc.get("factor", 0.2),
                patience=sc.get("patience", 20),
                min_scale=sc.get("min_lr", 0.0) / max(base_lr, 1e-12),
            ),
        )
        needs_value = True
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
    return tx, schedule, needs_value
