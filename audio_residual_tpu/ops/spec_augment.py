"""SpecAugment-style time/freq stripe masking (train-time only).

Reference: torchlibrosa ``SpecAugmentation(time_drop_width=64,
time_stripes_num=2, freq_drop_width=8, freq_stripes_num=2)`` instantiated at
`CLAP/src/laion_clap/clap_module/htsat.py:689-690` and applied in training
forward (`htsat.py:903-904`).

TPU-first: the torch version loops over batch samples on the host; here the
stripe positions are sampled vectorised and applied as a boolean mask — fully
inside jit with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["drop_stripes", "spec_augment"]


def drop_stripes(
    rng: jax.Array, x: jnp.ndarray, axis: int, drop_width: int, stripes_num: int
) -> jnp.ndarray:
    """Zero ``stripes_num`` random stripes of width ``U[0, drop_width)`` along
    ``axis``, independently per batch element (axis 0)."""
    b = x.shape[0]
    dim = x.shape[axis]
    k1, k2 = jax.random.split(rng)
    widths = jax.random.randint(k1, (b, stripes_num), 0, drop_width)
    starts = jax.random.randint(k2, (b, stripes_num), 0, jnp.maximum(dim - widths, 1))
    pos = jnp.arange(dim)  # [dim]
    # mask[b, d] = any stripe covers d
    covered = (pos[None, None, :] >= starts[:, :, None]) & (
        pos[None, None, :] < (starts + widths)[:, :, None]
    )
    keep = ~jnp.any(covered, axis=1)  # [B, dim]
    shape = [1] * x.ndim
    shape[0] = b
    shape[axis] = dim
    return x * keep.astype(x.dtype).reshape(shape)


def spec_augment(
    rng: jax.Array,
    x: jnp.ndarray,
    *,
    time_drop_width: int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 8,
    freq_stripes_num: int = 2,
) -> jnp.ndarray:
    """x: ``[B, T, F]`` log-mel; masks time stripes then freq stripes."""
    k1, k2 = jax.random.split(rng)
    x = drop_stripes(k1, x, axis=1, drop_width=time_drop_width, stripes_num=time_stripes_num)
    x = drop_stripes(k2, x, axis=2, drop_width=freq_drop_width, stripes_num=freq_stripes_num)
    return x
