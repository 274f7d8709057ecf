"""Feature-fusion ops: DAF / AFF / iAFF, 1-D and 2-D variants.

Reference: `CLAP/src/laion_clap/clap_module/feature_fusion.py` (from
"Attentional Feature Fusion", WACV 2021). Used to merge the global shrunk mel
with local mel chunks for >10 s audio (`htsat.py:918-938` 1-D path before
patch embed; `htsat.py:100-134` 2-D path inside PatchEmbed).

Semantics:
  * DAF: plain add.
  * AFF: ``m = sigmoid(local_att(xa) + global_att(xa))`` with ``xa = x + y``;
    out ``2·x·m + 2·y·(1-m)``. local_att = conv1(C->C/r) -> BN -> ReLU ->
    conv(C/r->C) -> BN over the raw feature map; global_att = the same MLP on
    the global-avg-pooled vector.
  * iAFF: two stacked AFF stages (`feature_fusion.py:23-130`).

Functional JAX with a params pytree; BN carried as (scale, bias, mean, var)
eval-statistics (the fusion models are used at inference in this project).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_aff_params", "init_iaff_params", "daf", "aff", "iaff"]


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv_init(key, c_in, c_out, ksize):
    fan_in = c_in * int(np.prod(ksize))
    lim = 1.0 / np.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(key, (*ksize, c_in, c_out), minval=-lim, maxval=lim),
        "bias": jnp.zeros((c_out,)),
    }


def _att_branch_init(key, channels, r=4, kind="2D"):
    inter = channels // r
    k1, k2 = jax.random.split(key)
    ksize = (1, 1) if kind == "2D" else (1,)
    return {
        "conv1": _conv_init(k1, channels, inter, ksize),
        "bn1": _bn_init(inter),
        "conv2": _conv_init(k2, inter, channels, ksize),
        "bn2": _bn_init(channels),
    }


def init_aff_params(key, channels, r=4, kind="2D"):
    k1, k2 = jax.random.split(key)
    return {
        "local_att": _att_branch_init(k1, channels, r, kind),
        "global_att": _att_branch_init(k2, channels, r, kind),
    }


def init_iaff_params(key, channels, r=4, kind="2D"):
    ks = jax.random.split(key, 4)
    return {
        "local_att": _att_branch_init(ks[0], channels, r, kind),
        "global_att": _att_branch_init(ks[1], channels, r, kind),
        "local_att2": _att_branch_init(ks[2], channels, r, kind),
        "global_att2": _att_branch_init(ks[3], channels, r, kind),
    }


def _bn(p, x):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]


def _conv(p, x, kind):
    dn = ("NHWC", "HWIO", "NHWC") if kind == "2D" else ("NWC", "WIO", "NWC")
    return (
        jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(1,) * (2 if kind == "2D" else 1),
            padding="VALID", dimension_numbers=dn,
        )
        + p["bias"]
    )


def _att(p, x, kind):
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, kind)))
    return _bn(p["bn2"], _conv(p["conv2"], h, kind))


def _global_pool(x, kind):
    axes = (1, 2) if kind == "2D" else (1,)
    return jnp.mean(x, axis=axes, keepdims=True)


def daf(x, y):
    """Direct add fusion (`feature_fusion.py:11-20`)."""
    return x + y


def aff(params, x, y, kind="2D"):
    """Attentional feature fusion (`feature_fusion.py:133-193`).

    x, y: NHWC (2D) or NWC (1D). Returns ``2 x m + 2 y (1 - m)``.
    """
    xa = x + y
    xl = _att(params["local_att"], xa, kind)
    xg = _att(params["global_att"], _global_pool(xa, kind), kind)
    m = jax.nn.sigmoid(xl + xg)
    return 2 * x * m + 2 * y * (1 - m)


def iaff(params, x, y, kind="2D"):
    """Iterative AFF (`feature_fusion.py:23-130`): first stage refines the
    fusion weights, second stage applies them."""
    xa = x + y
    xl = _att(params["local_att"], xa, kind)
    xg = _att(params["global_att"], _global_pool(xa, kind), kind)
    m1 = jax.nn.sigmoid(xl + xg)
    xi = x * m1 + y * (1 - m1)
    xl2 = _att(params["local_att2"], xi, kind)
    xg2 = _att(params["global_att2"], _global_pool(xi, kind), kind)
    m2 = jax.nn.sigmoid(xl2 + xg2)
    return x * m2 + y * (1 - m2)
