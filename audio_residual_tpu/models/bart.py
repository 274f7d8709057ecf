"""BART encoder text tower (``tmodel="bart"``).

Reference: `CLAP/src/laion_clap/clap_module/model.py:515-524` builds
``BartModel.from_pretrained('facebook/bart-base')`` and `model.py:637-645`
takes the **unmasked mean** over ``encoder_last_hidden_state`` as the text
feature (the reference averages padding positions too — reproduced exactly).

Only the encoder half is needed (the decoder is never called). bart-base:
6 post-LN encoder layers, d_model 768, 12 heads, ffn 3072, learned positions
with the HF offset of 2, ``layernorm_embedding`` after the summed embeddings.
Params-pytree layout mirrors HF so :func:`audio_residual_tpu.models.convert.
convert_bart_state_dict` can port checkpoint weights mechanically.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["BartConfig", "init_bart_params", "bart_apply"]

_POS_OFFSET = 2  # HF BartLearnedPositionalEmbedding hard-codes +2


@dataclass(frozen=True)
class BartConfig:
    vocab_size: int = 50265
    d_model: int = 768
    num_layers: int = 6
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5


def _ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _dense(key, d_in, d_out, std=0.02):
    return {
        "kernel": std * jax.random.normal(key, (d_in, d_out)),
        "bias": jnp.zeros((d_out,)),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_bart_params(key: jax.Array, cfg: BartConfig = BartConfig()) -> dict:
    keys = iter(jax.random.split(key, 4 + 6 * cfg.num_layers))
    d = cfg.d_model
    params = {
        "embed_tokens": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, d)),
        "embed_positions": 0.02
        * jax.random.normal(next(keys), (cfg.max_position_embeddings + _POS_OFFSET, d)),
        "ln_emb": _ln(d),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "attn": {
                    "q": _dense(next(keys), d, d),
                    "k": _dense(next(keys), d, d),
                    "v": _dense(next(keys), d, d),
                    "out": _dense(next(keys), d, d),
                },
                "ln1": _ln(d),
                "fc1": _dense(next(keys), d, cfg.ffn_dim),
                "fc2": _dense(next(keys), cfg.ffn_dim, d),
                "ln2": _ln(d),
            }
        )
    return params


def _apply_ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _apply_dense(p, x):
    return x @ p["kernel"] + p["bias"]


def bart_apply(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    cfg: BartConfig = BartConfig(),
) -> dict:
    """Encoder forward -> ``{"encoder_last_hidden_state": [B, L, D]}``."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    b, l = input_ids.shape
    d = cfg.d_model
    nh = cfg.num_heads
    hd = d // nh

    x = params["embed_tokens"][input_ids]
    x = x + params["embed_positions"][jnp.arange(l) + _POS_OFFSET]
    x = _apply_ln(params["ln_emb"], x, cfg.layer_norm_eps)

    bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * jnp.finfo(
        x.dtype
    ).min

    for lp in params["layers"]:
        a = lp["attn"]
        # HF BartAttention scales q by head_dim**-0.5 before the matmul
        q = (_apply_dense(a["q"], x) * (hd**-0.5)).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        k = _apply_dense(a["k"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        v = _apply_dense(a["v"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(attn + bias, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, l, d)
        x = _apply_ln(lp["ln1"], x + _apply_dense(a["out"], ctx), cfg.layer_norm_eps)
        h = jax.nn.gelu(_apply_dense(lp["fc1"], x), approximate=False)
        x = _apply_ln(lp["ln2"], x + _apply_dense(lp["fc2"], h), cfg.layer_norm_eps)

    return {"encoder_last_hidden_state": x}
