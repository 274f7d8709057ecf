"""LR schedules. Reference: ``cosine_lr`` (`training/scheduler.py:4-23`) —
linear warmup then cosine decay to zero over total steps."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cosine_lr"]


def cosine_lr(base_lr: float, warmup: int, total_steps: int):
    """Returns ``f(step) -> lr`` usable with optax (jnp-traceable)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / jnp.maximum(warmup, 1)
        e = (step - warmup) / jnp.maximum(total_steps - warmup, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return schedule
