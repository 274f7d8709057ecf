"""RoBERTa encoder in JAX — the CLAP text tower.

Replaces the reference's ``RobertaModel.from_pretrained('roberta-base')``
(`CLAP/src/laion_clap/clap_module/model.py:505-514`); CLAP uses the
``pooler_output`` (`model.py:633-640`). Functional params-pytree design; the
tree layout mirrors HF so :mod:`audio_residual_tpu.models.convert` can port
the published checkpoint weights mechanically.

Config defaults = roberta-base: 12 layers, 768 hidden, 12 heads, 3072
intermediate, vocab 50265, learned positions with padding-offset ids
(pad_token_id = 1), LN eps 1e-5, exact (erf) gelu.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["RobertaConfig", "init_roberta_params", "roberta_apply"]


@dataclass(frozen=True)
class RobertaConfig:
    """Also covers BERT (`model.py:494-504` bert branch): set
    ``style="bert"`` — absolute 0-based position ids instead of RoBERTa's
    padding-offset ids; everything else (block structure, pooler) is shared.
    bert-base defaults: vocab 30522, max_pos 512, type_vocab 2, pad 0."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    style: str = "roberta"  # "roberta" | "bert"
    dtype: Any = jnp.float32


def _ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _dense(key, d_in, d_out, std=0.02):
    return {
        "kernel": std * jax.random.normal(key, (d_in, d_out)),
        "bias": jnp.zeros((d_out,)),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_roberta_params(key: jax.Array, cfg: RobertaConfig = RobertaConfig()) -> dict:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    params = {
        "embeddings": {
            "word": 0.02 * jax.random.normal(next(keys), (cfg.vocab_size, d)),
            "position": 0.02 * jax.random.normal(next(keys), (cfg.max_position_embeddings, d)),
            "token_type": 0.02 * jax.random.normal(next(keys), (cfg.type_vocab_size, d)),
            "ln": _ln(d),
        },
        "layers": [],
        "pooler": _dense(next(keys), d, d),
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
                "mlp": {
                    "fc1": _dense(next(keys), d, cfg.intermediate_size),
                    "fc2": _dense(next(keys), cfg.intermediate_size, d),
                },
                "ln2": _ln(d),
            }
        )
    return params


def _apply_ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _apply_dense(p, x, mxu_dtype=None):
    """Matmul with optional bf16 MXU inputs and f32 accumulation (the AMP
    pattern shared with the Pallas kernels: LN/softmax stay f32)."""
    if mxu_dtype is not None:
        h = jnp.dot(x.astype(mxu_dtype), p["kernel"].astype(mxu_dtype),
                    preferred_element_type=jnp.float32)
        return h + p["bias"]
    return x @ p["kernel"] + p["bias"]


def position_ids_from_input_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa's padding-offset position ids: pad tokens get ``pad_token_id``,
    real tokens count up from ``pad_token_id + 1`` (HF
    ``create_position_ids_from_input_ids`` semantics)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=-1) * mask
    return incremental + pad_token_id


def roberta_apply(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    cfg: RobertaConfig = RobertaConfig(),
    *,
    compute_dtype=None,
) -> dict:
    """Returns ``{"last_hidden_state": [B, L, D], "pooler_output": [B, D]}``.

    ``compute_dtype=jnp.bfloat16`` runs the dense/attention matmul inputs in
    bf16 on the MXU (f32 accumulate; LayerNorm and softmax stay f32) —
    mirroring the audio branch's AMP mode."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

    emb = params["embeddings"]
    if cfg.style == "bert":
        pos_ids = jnp.broadcast_to(jnp.arange(input_ids.shape[-1]), input_ids.shape)
    else:
        pos_ids = position_ids_from_input_ids(input_ids, cfg.pad_token_id)
    x = (
        emb["word"][input_ids]
        + emb["position"][pos_ids]
        + emb["token_type"][jnp.zeros_like(input_ids)]
    )
    x = _apply_ln(emb["ln"], x, cfg.layer_norm_eps)

    # additive attention bias: 0 for attended, big-negative for masked
    bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * jnp.finfo(x.dtype).min

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    b, l, d = x.shape
    dt = compute_dtype
    for lp in params["layers"]:
        a = lp["attn"]
        q = _apply_dense(a["q"], x, dt).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        k = _apply_dense(a["k"], x, dt).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        v = _apply_dense(a["v"], x, dt).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        if dt is not None:
            q, k = q.astype(dt), k.astype(dt)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.asarray(hd, attn.dtype)) + bias
        probs = jax.nn.softmax(attn, axis=-1)
        if dt is not None:
            probs, v = probs.astype(dt), v.astype(dt)
        else:
            probs = probs.astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = _apply_ln(lp["ln1"], x + _apply_dense(a["out"], ctx, dt), cfg.layer_norm_eps)
        h = jax.nn.gelu(_apply_dense(lp["mlp"]["fc1"], x, dt), approximate=False)
        x = _apply_ln(lp["ln2"], x + _apply_dense(lp["mlp"]["fc2"], h, dt), cfg.layer_norm_eps)

    pooled = jnp.tanh(_apply_dense(params["pooler"], x[:, 0], dt))
    return {"last_hidden_state": x, "pooler_output": pooled}
