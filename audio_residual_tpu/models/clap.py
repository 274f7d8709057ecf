"""CLAP dual-tower model: HTSAT (or PANN) audio branch + RoBERTa text branch,
two-layer MLP projections into the 512-d joint space, MLP "transform" heads
for the 4-term loss, and learnable logit scales.

Reference: ``CLAP`` (`CLAP/src/laion_clap/clap_module/model.py:422-762`).
Functional design: ``clap_apply(params, audio=..., text=...)`` mirrors the
reference ``forward`` contract (`model.py:650-693`) — both towers, normalised
features, MLP features, exp'd logit scales — while ``encode_audio`` /
``encode_text`` cover the embedding paths (`model.py:698-762`) including the
fork's ``get_audio_output_dict`` tap access.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.models import bart as bart_mod
from audio_residual_tpu.models import clip_text as clip_text_mod
from audio_residual_tpu.models import htsat as htsat_mod
from audio_residual_tpu.models import roberta as roberta_mod

__all__ = ["CLAPConfig", "init_clap_params", "clap_apply", "encode_audio", "encode_text"]


@dataclass(frozen=True)
class CLAPConfig:
    """Static CLAP config (HTSAT-tiny + roberta defaults, `HTSAT-tiny.json`)."""

    embed_dim: int = 768  # audio tower output width
    joint_embed_shape: int = 512
    mlp_act: str = "relu"
    audio: htsat_mod.HTSATConfig = field(default_factory=htsat_mod.HTSATConfig)
    # RobertaConfig (roberta/bert — bert via style="bert"), ClipTextConfig
    # (transformer), or BartConfig (bart); must match text_model_type.
    text: Any = field(default_factory=roberta_mod.RobertaConfig)
    text_model_type: str = "roberta"  # roberta | bert | transformer | bart
    audio_model_type: str = "HTSAT"
    context_length: int = 77


def text_tower_width(cfg: CLAPConfig) -> int:
    """Input width of the text projection MLP — transformer towers project
    from ``width`` (512 for the CLIP tower), HF-style towers from
    ``hidden_size``/``d_model`` = 768 (`model.py:486-527`)."""
    t = cfg.text_model_type
    if t == "transformer":
        return cfg.text.width
    if t in ("roberta", "bert"):
        return cfg.text.hidden_size
    if t == "bart":
        return cfg.text.d_model
    raise RuntimeError(f"Model config for {t} not found.")


def _init_text_branch(key: jax.Array, cfg: CLAPConfig) -> dict:
    t = cfg.text_model_type
    if t in ("roberta", "bert"):
        return roberta_mod.init_roberta_params(key, cfg.text)
    if t == "transformer":
        return clip_text_mod.init_clip_text_params(key, cfg.text)
    if t == "bart":
        return bart_mod.init_bart_params(key, cfg.text)
    raise RuntimeError(f"Model config for {t} not found.")


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize`` semantics: divide by ``max(||x||, eps)``.

    Implemented as ``x * rsqrt(max(sum(x²), eps²))`` so both the value AND the
    gradient are finite at x = 0 (a bare ``sqrt`` has a NaN gradient there
    even under ``maximum`` — relevant at random init, where ReLU projections
    can emit exactly-zero vectors)."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def _mlp_act(cfg: CLAPConfig, x):
    if cfg.mlp_act == "relu":
        return jax.nn.relu(x)
    if cfg.mlp_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(cfg.mlp_act)


def _proj_init(key, d_in, d_mid, d_out):
    k1, k2 = jax.random.split(key)
    lim1, lim2 = (1 / np.sqrt(d_in)), (1 / np.sqrt(d_mid))
    return {
        "fc1": {
            "kernel": jax.random.uniform(k1, (d_in, d_mid), minval=-lim1, maxval=lim1),
            "bias": jnp.zeros((d_mid,)),
        },
        "fc2": {
            "kernel": jax.random.uniform(k2, (d_mid, d_out), minval=-lim2, maxval=lim2),
            "bias": jnp.zeros((d_out,)),
        },
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_clap_params(key: jax.Array, cfg: CLAPConfig = CLAPConfig()) -> dict:
    ka, kt, k1, k2, k3, k4 = jax.random.split(key, 6)
    j = cfg.joint_embed_shape
    text_width = text_tower_width(cfg)
    if cfg.audio_model_type == "PANN":
        from audio_residual_tpu.models import pann as pann_mod

        audio_branch = pann_mod.init_pann_params(ka, cfg.audio)
    else:
        audio_branch = htsat_mod.init_htsat_params(ka, cfg.audio)
    return {
        "audio_branch": audio_branch,
        "text_branch": _init_text_branch(kt, cfg),
        # two-layer MLP projections (`model.py:517-537`)
        "audio_projection": _proj_init(k1, cfg.embed_dim, j, j),
        "text_projection": _proj_init(k2, text_width, j, j),
        # MLPLayers transform heads for the 4-term loss (`model.py:489-533`)
        "audio_transform": _proj_init(k3, j, j, j),
        "text_transform": _proj_init(k4, j, j, j),
        "logit_scale_a": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "logit_scale_t": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def apply_projection(cfg: CLAPConfig, p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> act -> Linear (`model.py:533-537`)."""
    h = x @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = _mlp_act(cfg, h)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def apply_transform(
    cfg: CLAPConfig, p: dict, x: jnp.ndarray, *, train: bool = False, rng=None, drop: float = 0.1
) -> jnp.ndarray:
    """MLPLayers([512,512,512], dropout=0.1) — Linear/ReLU/Dropout/Linear
    (`model.py:27-44`; note the trailing ReLU+Dropout are stripped by the
    ``sequence[:-2]``). Dropout active only in training."""
    h = x @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = jax.nn.relu(h)
    if train and rng is not None and drop > 0:
        h = h * jax.random.bernoulli(rng, 1 - drop, h.shape) / (1 - drop)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def encode_audio(
    params: dict,
    batch,
    cfg: CLAPConfig = CLAPConfig(),
    *,
    train: bool = False,
    rng=None,
    taps: tuple[str, ...] = (),
    residual: dict | None = None,
    double_ffn_compat: bool = True,
    compute_dtype: Any = None,
    start_layer: int = 0,
    stop_at_layer: int | None = None,
    stop_at_image: bool = False,
) -> dict:
    """Audio branch forward -> output dict (the `get_audio_output_dict`
    equivalent, `model.py:745-762`). Pass ``taps`` for attention/residual
    extraction; ``projected`` / ``normalized`` keys are added on top of the
    branch outputs. The branch dispatches on ``cfg.audio_model_type``
    (`model.py:464-470`); taps/residual/layer-splitting are HTSAT-only
    (the reference's ResiDual targets Swin blocks). ``stop_at_image`` /
    ``batch={"image": ...}`` split at the post-frontend image boundary
    (see :func:`htsat_apply`)."""
    if cfg.audio_model_type == "PANN":
        if taps or residual or start_layer or stop_at_layer is not None or stop_at_image:
            raise ValueError(
                "taps/residual/start_layer/stop_at_layer are HTSAT-only"
            )
        from audio_residual_tpu.models import pann as pann_mod

        out = pann_mod.pann_apply(
            params["audio_branch"], batch, cfg.audio, train=train, rng=rng
        )
    else:
        out = htsat_mod.htsat_apply(
            params["audio_branch"],
            batch,
            cfg.audio,
            train=train,
            rng=rng,
            taps=taps,
            residual=residual,
            double_ffn_compat=double_ffn_compat,
            compute_dtype=compute_dtype,
            start_layer=start_layer,
            stop_at_layer=stop_at_layer,
            stop_at_image=stop_at_image,
        )
    if stop_at_layer is not None or stop_at_image:
        return out  # {"tokens": ...} / {"image": ...} prefix
    proj = apply_projection(cfg, params["audio_projection"], out["embedding"])
    out["projected"] = proj
    out["normalized"] = l2_normalize(proj)
    return out


def encode_text(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    cfg: CLAPConfig = CLAPConfig(),
    *,
    normalize: bool = True,
    compute_dtype: Any = None,
) -> jnp.ndarray:
    """Text branch -> tower feature -> projection (-> L2 normalise),
    dispatched on ``cfg.text_model_type`` (`model.py:602-648`):

    * roberta / bert — HF-style ``pooler_output`` (`model.py:617-636`)
    * transformer — CLIP tower, EOT-token feature (`model.py:603-616`)
    * bart — **unmasked** mean over ``encoder_last_hidden_state``
      (`model.py:637-645` averages padding positions too)

    ``compute_dtype`` reaches the roberta/bert tower (bf16 MXU inputs, f32
    accumulate); the transformer/bart towers run f32 regardless.
    """
    t = cfg.text_model_type
    if t in ("roberta", "bert"):
        pooled = roberta_mod.roberta_apply(
            params["text_branch"], input_ids, attention_mask, cfg.text,
            compute_dtype=compute_dtype,
        )["pooler_output"]
    elif t == "transformer":
        pooled = clip_text_mod.clip_text_apply(params["text_branch"], input_ids, cfg.text)
    elif t == "bart":
        hidden = bart_mod.bart_apply(
            params["text_branch"], input_ids, attention_mask, cfg.text
        )["encoder_last_hidden_state"]
        pooled = jnp.mean(hidden, axis=1)
    else:
        raise RuntimeError(f"Model type {t} not found.")
    x = apply_projection(cfg, params["text_projection"], pooled)
    if normalize:
        x = l2_normalize(x)
    return x


def clap_apply(
    params: dict,
    audio_batch,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    cfg: CLAPConfig = CLAPConfig(),
    *,
    train: bool = False,
    rng=None,
    compute_dtype: Any = None,
) -> dict:
    """Full contrastive forward (`model.py:650-693`): returns normalised
    audio/text features, their MLP-transformed variants, and exp'd logit
    scales — the inputs to :class:`~audio_residual_tpu.training.losses.ClipLoss`."""
    rng_a = rng_at = rng_tt = None
    if rng is not None:
        rng_a, rng_at, rng_tt = jax.random.split(rng, 3)
    audio_out = encode_audio(
        params, audio_batch, cfg, train=train, rng=rng_a, compute_dtype=compute_dtype
    )
    audio_features = audio_out["normalized"]
    text_features = encode_text(
        params, input_ids, attention_mask, cfg, compute_dtype=compute_dtype
    )
    extra = {}
    if train and "bn0_state" in audio_out:
        extra["bn0_state"] = audio_out["bn0_state"]
    return {
        **extra,
        "audio_features": audio_features,
        "text_features": text_features,
        "audio_features_mlp": apply_transform(
            cfg, params["audio_transform"], audio_features, train=train, rng=rng_at
        ),
        "text_features_mlp": apply_transform(
            cfg, params["text_transform"], text_features, train=train, rng=rng_tt
        ),
        "logit_scale_a": jnp.exp(params["logit_scale_a"]),
        "logit_scale_t": jnp.exp(params["logit_scale_t"]),
    }
