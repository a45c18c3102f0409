"""Optimizer and LR schedule.

Parity with ``/root/reference/train.py:18-26``: AdamW (lr 2.5e-4, weight decay
5e-5, eps 1e-8) under a OneCycle *linear* schedule over ``num_steps + 100``
steps with ``pct_start=0.001``, global-norm gradient clipping at 1.0
(``train.py:84``).  torch's OneCycleLR defaults give
``initial_lr = max_lr / 25`` and ``min_lr = initial_lr / 1e4``.

On TPU the reference's AMP GradScaler (``train.py:53``) is unnecessary —
bfloat16 has fp32's exponent range — so there is deliberately no loss scaler.
"""

from __future__ import annotations

import optax

from cermvs_tpu.config import configurable


def one_cycle_linear(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.001,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """Exact torch OneCycleLR(anneal_strategy='linear') schedule: phase
    boundaries at fractional steps ``pct_start*total - 1`` and ``total - 1``."""
    import jax.numpy as jnp

    initial = max_lr / div_factor
    minimum = initial / final_div_factor
    end_warm = pct_start * total_steps - 1.0
    end_total = total_steps - 1.0

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        pct1 = jnp.clip(t / jnp.maximum(end_warm, 1e-9), 0.0, 1.0)
        lr_warm = initial + (max_lr - initial) * pct1
        pct2 = jnp.clip(
            (t - end_warm) / jnp.maximum(end_total - end_warm, 1e-9), 0.0, 1.0)
        lr_anneal = max_lr + (minimum - max_lr) * pct2
        return jnp.where(t <= end_warm, lr_warm, lr_anneal)

    return schedule


@configurable("optimizer")
def fetch_optimizer(
    num_steps: int,
    lr: float = 0.00025,
    wdecay: float = 0.00005,
    epsilon: float = 1e-8,
    pct_start: float = 0.001,
    clip_norm: float = 1.0,
):
    """Returns (optax optimizer, schedule fn)."""
    schedule = one_cycle_linear(lr, num_steps + 100, pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon, weight_decay=wdecay),
    )
    return tx, schedule
