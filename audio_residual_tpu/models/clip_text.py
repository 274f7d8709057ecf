"""CLIP-style causal transformer text tower (``tmodel="transformer"``).

Reference: `clap_module/model.py:251-339` (Transformer / ResidualAttentionBlock)
+ the text branch wiring at `model.py:505-520,602-628`: token embedding,
learned positional embedding, pre-LN residual blocks with a causal mask,
final LN, then features taken at the argmax (EOT) token through the
projection. Used with the CLIP BPE tokenizer
(:class:`audio_residual_tpu.utils.tokenizer.ClipBPETokenizer`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ClipTextConfig", "init_clip_text_params", "clip_text_apply"]


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 77
    quick_gelu: bool = False


def _ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_clip_text_params(key: jax.Array, cfg: ClipTextConfig = ClipTextConfig()) -> dict:
    """CLIP init scheme (`model.py:551-560`): attn std w^-0.5, proj std
    (w^-0.5)(2L)^-0.5, fc std (2w)^-0.5; token emb 0.02, pos emb 0.01."""
    keys = iter(jax.random.split(key, 4 + 4 * cfg.layers))
    w = cfg.width
    proj_std = (w**-0.5) * ((2 * cfg.layers) ** -0.5)
    attn_std = w**-0.5
    fc_std = (2 * w) ** -0.5
    params = {
        "token_embedding": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, w)),
        "positional_embedding": 0.01 * jax.random.normal(next(keys), (cfg.context_length, w)),
        "ln_final": _ln(w),
        "blocks": [],
    }
    for _ in range(cfg.layers):
        params["blocks"].append(
            {
                "ln1": _ln(w),
                "attn": {
                    "in_proj": {
                        "kernel": attn_std * jax.random.normal(next(keys), (w, 3 * w)),
                        "bias": jnp.zeros((3 * w,)),
                    },
                    "out_proj": {
                        "kernel": proj_std * jax.random.normal(next(keys), (w, w)),
                        "bias": jnp.zeros((w,)),
                    },
                },
                "ln2": _ln(w),
                "mlp": {
                    "c_fc": {
                        "kernel": fc_std * jax.random.normal(next(keys), (w, 4 * w)),
                        "bias": jnp.zeros((4 * w,)),
                    },
                    "c_proj": {
                        "kernel": proj_std * jax.random.normal(next(keys), (4 * w, w)),
                        "bias": jnp.zeros((w,)),
                    },
                },
            }
        )
    return params


def _apply_ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu(x, quick):
    return x * jax.nn.sigmoid(1.702 * x) if quick else jax.nn.gelu(x, approximate=False)


def clip_text_apply(
    params: dict, tokens: jnp.ndarray, cfg: ClipTextConfig = ClipTextConfig()
) -> jnp.ndarray:
    """``tokens [B, L] -> EOT-token features [B, width]`` (`model.py:602-617`).

    The EOT position is the per-row argmax token id (EOT is the highest id in
    CLIP's vocab, `model.py:616`).
    """
    b, l = tokens.shape
    w = cfg.width
    nh = cfg.heads
    hd = w // nh
    x = params["token_embedding"][tokens] + params["positional_embedding"][:l]
    causal = jnp.triu(jnp.full((l, l), -jnp.inf, x.dtype), k=1)
    for blk in params["blocks"]:
        y = _apply_ln(blk["ln1"], x)
        qkv = y @ blk["attn"]["in_proj"]["kernel"] + blk["attn"]["in_proj"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3) / np.sqrt(hd)
        k = k.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores + causal, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, l, w)
        x = x + (ctx @ blk["attn"]["out_proj"]["kernel"] + blk["attn"]["out_proj"]["bias"])
        y = _apply_ln(blk["ln2"], x)
        h = _gelu(y @ blk["mlp"]["c_fc"]["kernel"] + blk["mlp"]["c_fc"]["bias"], cfg.quick_gelu)
        x = x + (h @ blk["mlp"]["c_proj"]["kernel"] + blk["mlp"]["c_proj"]["bias"])
    x = _apply_ln(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    return x[jnp.arange(b), eot]
