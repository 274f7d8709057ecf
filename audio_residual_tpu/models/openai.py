"""OpenAI CLIP checkpoint text-tower loader.

Reference: `clap_module/openai.py:23-129` + ``build_model_from_openai_state_dict``
(`model.py:851-893`): CLAP with ``tmodel="transformer"`` reuses the text
transformer of an OpenAI CLIP JIT archive.

Here: convert the text-relevant tensors of an OpenAI CLIP state dict into
:mod:`audio_residual_tpu.models.clip_text` params. The vision tower is out of
the audio framework's scope.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from audio_residual_tpu.models.clip_text import ClipTextConfig

__all__ = ["list_openai_models", "text_config_from_state_dict", "convert_openai_text_tower"]

# public OpenAI CLIP model names whose text towers are CLAP-compatible
OPENAI_MODELS = ["RN50", "RN101", "RN50x4", "RN50x16", "ViT-B-32", "ViT-B-16", "ViT-L-14"]


def list_openai_models() -> list[str]:
    return list(OPENAI_MODELS)


def text_config_from_state_dict(sd: Mapping[str, np.ndarray]) -> ClipTextConfig:
    """Infer the text-tower architecture (`model.py:858-871` semantics)."""
    vocab_size, width = np.asarray(sd["token_embedding.weight"]).shape
    context_length = np.asarray(sd["positional_embedding"]).shape[0]
    layers = len(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))
        }
    )
    heads = width // 64
    return ClipTextConfig(
        vocab_size=vocab_size, width=width, heads=heads, layers=layers,
        context_length=context_length, quick_gelu=True,  # OpenAI ckpts use QuickGELU
    )


def convert_openai_text_tower(sd: Mapping[str, np.ndarray]) -> tuple[dict, ClipTextConfig]:
    """OpenAI CLIP state dict -> (clip_text params, config)."""
    cfg = text_config_from_state_dict(sd)
    t = lambda x: np.ascontiguousarray(np.asarray(x).T)  # noqa: E731
    params = {
        "token_embedding": np.asarray(sd["token_embedding.weight"]),
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "ln_final": {
            "scale": np.asarray(sd["ln_final.weight"]),
            "bias": np.asarray(sd["ln_final.bias"]),
        },
        "blocks": [],
    }
    for i in range(cfg.layers):
        b = f"transformer.resblocks.{i}."
        params["blocks"].append(
            {
                "ln1": {"scale": np.asarray(sd[b + "ln_1.weight"]), "bias": np.asarray(sd[b + "ln_1.bias"])},
                "attn": {
                    "in_proj": {
                        "kernel": t(sd[b + "attn.in_proj_weight"]),
                        "bias": np.asarray(sd[b + "attn.in_proj_bias"]),
                    },
                    "out_proj": {
                        "kernel": t(sd[b + "attn.out_proj.weight"]),
                        "bias": np.asarray(sd[b + "attn.out_proj.bias"]),
                    },
                },
                "ln2": {"scale": np.asarray(sd[b + "ln_2.weight"]), "bias": np.asarray(sd[b + "ln_2.bias"])},
                "mlp": {
                    "c_fc": {"kernel": t(sd[b + "mlp.c_fc.weight"]), "bias": np.asarray(sd[b + "mlp.c_fc.bias"])},
                    "c_proj": {"kernel": t(sd[b + "mlp.c_proj.weight"]), "bias": np.asarray(sd[b + "mlp.c_proj.bias"])},
                },
            }
        )
    return params, cfg
