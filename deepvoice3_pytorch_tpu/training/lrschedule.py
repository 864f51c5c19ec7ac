# coding: utf-8
"""Learning-rate schedules (reference lrschedule.py), jnp-friendly so they
trace inside the jitted train step."""

import jax.numpy as jnp


def noam_learning_rate_decay(init_lr, global_step, warmup_steps=4000):
    warmup_steps = float(warmup_steps)
    step = global_step + 1.0
    return init_lr * warmup_steps ** 0.5 * jnp.minimum(
        step * warmup_steps ** -1.5, step ** -0.5)


def step_learning_rate_decay(init_lr, global_step, anneal_rate=0.98,
                             anneal_interval=30000):
    return init_lr * anneal_rate ** (global_step // anneal_interval)


def cyclic_cosine_annealing(init_lr, global_step, T, M):
    """Cyclic cosine annealing (arXiv:1704.00109)."""
    TdivM = T // M
    return init_lr / 2.0 * (
        jnp.cos(jnp.pi * ((global_step - 1) % TdivM) / TdivM) + 1.0)


def constant_learning_rate(init_lr, global_step):
    return init_lr * jnp.ones_like(jnp.asarray(global_step, jnp.float32))


def get_schedule(name, init_lr, **kwargs):
    fn = globals()[name]
    return lambda step: fn(init_lr, step, **kwargs)
