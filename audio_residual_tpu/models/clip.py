"""Full CLIP dual-tower assembly for the vision model configs.

The reference ships ten CLIP-legacy vision configs from its open_clip
ancestry (`clap_module/model_configs/RN50.json`, `ViT-B-16.json`, ...)
but its registry filter only admits configs carrying an ``audio_cfg``
(`clap_module/factory.py:41`), so ``create_model("RN50", ...)`` raises
there even though the tower classes exist (`model.py:47-241,305-372`).
Here the registry admits them and this module supplies the working
assembly — vision tower from :mod:`audio_residual_tpu.models.vision`
plus the CLIP BPE text tower from
:mod:`audio_residual_tpu.models.clip_text` — a documented extension
closing the reference's own dead registry path.

Wiring follows open_clip's CLIP (`model.py:422-560` ancestry): image
features = tower output (already projected to ``embed_dim``); text
features = EOT-token features @ ``text_projection``; both L2-normalized
for similarity against ``exp(logit_scale)``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.models.clip_text import (
    ClipTextConfig,
    clip_text_apply,
    init_clip_text_params,
)
from audio_residual_tpu.models.vision import VisionCfg, create_vision_tower

__all__ = ["CLIPConfig", "init_clip_params", "clip_encode_image", "clip_encode_text", "clip_apply"]


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    vision: VisionCfg
    text: ClipTextConfig


def _l2(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> dict:
    kv, kt, kp = jax.random.split(key, 3)
    init_v, _ = create_vision_tower(cfg.embed_dim, cfg.vision)
    return {
        "visual": init_v(kv),
        "text_branch": init_clip_text_params(kt, cfg.text),
        # CLIP init: std = width^-0.5 (`model.py:560` ancestry)
        "text_projection": (cfg.text.width**-0.5)
        * jax.random.normal(kp, (cfg.text.width, cfg.embed_dim)),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def clip_encode_image(
    params: dict, images: jnp.ndarray, cfg: CLIPConfig, *, normalize: bool = True
) -> jnp.ndarray:
    """``images [B, H, W, 3] (NHWC, normalized pixels) -> [B, embed_dim]``."""
    _, apply_v = create_vision_tower(cfg.embed_dim, cfg.vision)
    x = apply_v(params["visual"], images)
    return _l2(x) if normalize else x


def clip_encode_text(
    params: dict, tokens: jnp.ndarray, cfg: CLIPConfig, *, normalize: bool = True
) -> jnp.ndarray:
    """``tokens [B, 77] (ClipBPETokenizer) -> [B, embed_dim]``."""
    x = clip_text_apply(params["text_branch"], tokens, cfg.text) @ params["text_projection"]
    return _l2(x) if normalize else x


def clip_apply(params: dict, images: jnp.ndarray, tokens: jnp.ndarray, cfg: CLIPConfig):
    """Returns ``(image_features, text_features, logit_scale)`` with
    normalized features, mirroring the open_clip forward contract."""
    return (
        clip_encode_image(params, images, cfg),
        clip_encode_text(params, tokens, cfg),
        jnp.exp(params["logit_scale"]),
    )
