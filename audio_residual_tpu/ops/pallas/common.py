"""Numeric helpers shared by the Pallas kernels.

Single home for the pieces whose exact formulas the split-plan vs
monolithic-kernel parity depends on — a tolerance/eps change here reaches
every kernel at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["erf_f32", "gelu_exact", "layer_norm"]


def erf_f32(x):
    """erf via Abramowitz-Stegun 7.1.26 (max error 1.5e-7 == f32 resolution).

    Mosaic lowers neither erf nor erfc; exp it does.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x):
    """Exact (erf) gelu matching torch nn.GELU() within f32 resolution."""
    return x * 0.5 * (1.0 + erf_f32(x * 0.7071067811865476))


def layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
