"""Torch checkpoint -> JAX params converter for the published CLAP weights.

Maps the reference's torch ``state_dict`` layout (the `630k*-best.pt`
checkpoints loadable by `CLAP/src/laion_clap/hook.py:75-119` /
`clap_module/factory.py:53-70`) onto this framework's params pytree.

Layout rules:
  * torch ``nn.Linear.weight`` is ``[out, in]`` -> our ``kernel`` is
    ``[in, out]`` (transpose);
  * torch ``nn.Conv2d.weight`` is ``[O, I, H, W]`` -> HWIO ``(2, 3, 1, 0)``;
  * ``module.`` prefixes are stripped and HF ``position_ids`` buffers dropped
    (mirroring `factory.py:53-70`);
  * torchlibrosa DSP buffers (``spectrogram_extractor.*``, frozen) are
    skipped — our frontend rebuilds them analytically — except
    ``logmel_extractor.melW`` which can be kept to guarantee a bit-identical
    mel basis (returned separately);
  * Swin ``attn.relative_position_index`` buffers are skipped (static here).

Works with plain numpy arrays so it does not require torch at call time:
pass any mapping ``name -> ndarray``.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

__all__ = ["load_torch_checkpoint", "convert_clap_state_dict", "convert_htsat_state_dict", "convert_roberta_state_dict"]


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint file into ``{name: np.ndarray}`` (host-side)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _t(x):  # linear weight -> kernel
    return np.ascontiguousarray(np.asarray(x).T)


def _conv(x):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 3, 1, 0)))


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _lin(sd, prefix, bias=True):
    p = {"kernel": _t(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    return p


def convert_htsat_state_dict(
    sd: Mapping[str, np.ndarray], prefix: str = "audio_branch.", depths=(2, 2, 6, 2)
) -> dict:
    """HTSAT subtree of a reference checkpoint -> our params pytree.

    Also accepts standalone HTS-AT audio checkpoints after the caller applies
    the ``sed_model.`` -> ``audio_branch.`` remap (`factory.py:166-217`).
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    p: dict = {
        "bn0": {
            "scale": np.asarray(g("bn0.weight")),
            "bias": np.asarray(g("bn0.bias")),
            "mean": np.asarray(g("bn0.running_mean")),
            "var": np.asarray(g("bn0.running_var")),
        },
        "patch_embed": {
            "proj": {
                "kernel": _conv(g("patch_embed.proj.weight")),
                "bias": np.asarray(g("patch_embed.proj.bias")),
            },
            "norm": _ln(sd, prefix + "patch_embed.norm"),
        },
        "norm": _ln(sd, prefix + "norm"),
        "tscam_conv": {
            "kernel": _conv(g("tscam_conv.weight")),
            "bias": np.asarray(g("tscam_conv.bias")),
        },
        "head": _lin(sd, prefix + "head"),
    }
    layers = []
    for i, depth in enumerate(depths):
        blocks = []
        for j in range(depth):
            bp = f"{prefix}layers.{i}.blocks.{j}."
            blocks.append(
                {
                    "norm1": _ln(sd, bp + "norm1"),
                    "attn": {
                        "qkv": _lin(sd, bp + "attn.qkv"),
                        "proj": _lin(sd, bp + "attn.proj"),
                        "rel_bias_table": np.asarray(sd[bp + "attn.relative_position_bias_table"]),
                    },
                    "norm2": _ln(sd, bp + "norm2"),
                    "mlp": {
                        "fc1": _lin(sd, bp + "mlp.fc1"),
                        "fc2": _lin(sd, bp + "mlp.fc2"),
                    },
                }
            )
        layer = {"blocks": blocks}
        dsp = f"{prefix}layers.{i}.downsample."
        if dsp + "norm.weight" in sd:
            layer["downsample"] = {
                "norm": _ln(sd, dsp + "norm"),
                "reduction": _lin(sd, dsp + "reduction", bias=False),
            }
        layers.append(layer)
    p["layers"] = layers
    return p


def convert_roberta_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "text_branch.") -> dict:
    """HF RoBERTa subtree -> our params pytree (see models/roberta.py)."""
    g = prefix
    num_layers = 0
    pat = re.compile(re.escape(g) + r"encoder\.layer\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            num_layers = max(num_layers, int(m.group(1)) + 1)
    p: dict = {
        "embeddings": {
            "word": np.asarray(sd[g + "embeddings.word_embeddings.weight"]),
            "position": np.asarray(sd[g + "embeddings.position_embeddings.weight"]),
            "token_type": np.asarray(sd[g + "embeddings.token_type_embeddings.weight"]),
            "ln": _ln(sd, g + "embeddings.LayerNorm"),
        },
        "layers": [],
        "pooler": _lin(sd, g + "pooler.dense"),
    }
    for i in range(num_layers):
        lp = f"{g}encoder.layer.{i}."
        p["layers"].append(
            {
                "attn": {
                    "q": _lin(sd, lp + "attention.self.query"),
                    "k": _lin(sd, lp + "attention.self.key"),
                    "v": _lin(sd, lp + "attention.self.value"),
                    "out": _lin(sd, lp + "attention.output.dense"),
                },
                "ln1": _ln(sd, lp + "attention.output.LayerNorm"),
                "mlp": {
                    "fc1": _lin(sd, lp + "intermediate.dense"),
                    "fc2": _lin(sd, lp + "output.dense"),
                },
                "ln2": _ln(sd, lp + "output.LayerNorm"),
            }
        )
    return p


def _seq_mlp(sd, prefix, idx=(0, 2)):
    """nn.Sequential(Linear, act, Linear) -> {fc1, fc2} (`model.py:533-537`)."""
    return {"fc1": _lin(sd, f"{prefix}.{idx[0]}"), "fc2": _lin(sd, f"{prefix}.{idx[1]}")}


def convert_clap_state_dict(sd: Mapping[str, np.ndarray], depths=(2, 2, 6, 2)) -> dict:
    """Full CLAP checkpoint -> params pytree for
    :func:`audio_residual_tpu.models.clap.clap_apply`."""
    params = {
        "audio_branch": convert_htsat_state_dict(sd, "audio_branch.", depths),
        "text_branch": convert_roberta_state_dict(sd, "text_branch."),
        "audio_projection": _seq_mlp(sd, "audio_projection"),
        "text_projection": _seq_mlp(sd, "text_projection"),
        # MLPLayers: Sequential(Linear, ReLU, Dropout, Linear) -> indices 0, 3
        "audio_transform": _seq_mlp(sd, "audio_transform.sequential", idx=(0, 3)),
        "text_transform": _seq_mlp(sd, "text_transform.sequential", idx=(0, 3)),
        "logit_scale_a": np.asarray(sd["logit_scale_a"]),
        "logit_scale_t": np.asarray(sd["logit_scale_t"]),
    }
    return params
