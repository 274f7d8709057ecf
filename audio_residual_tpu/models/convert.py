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

__all__ = [
    "load_torch_checkpoint",
    "convert_clap_state_dict",
    "convert_htsat_state_dict",
    "convert_pann_state_dict",
    "convert_roberta_state_dict",
    "convert_bart_state_dict",
    "htsat_params_to_state_dict",
    "roberta_params_to_state_dict",
    "clap_params_to_state_dict",
]


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


def convert_pann_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "audio_branch.") -> dict:
    """PANN subtree of a reference checkpoint -> our params pytree
    (see models/pann.py; the ``--pretrained-audio`` key remaps live in
    `factory.py:166-187`). Conv kernels OIHW -> HWIO, linear weights
    transposed; the DSP extractors (spectrogram/logmel) have no params here
    — the frontend is a kernel, not a module."""

    def g(k):
        return np.asarray(sd[prefix + k])

    def bn(src):
        return {
            "scale": g(src + ".weight"), "bias": g(src + ".bias"),
            "mean": g(src + ".running_mean"), "var": g(src + ".running_var"),
        }

    p: dict = {"bn0": bn("bn0"), "conv_blocks": []}
    i = 1
    while f"{prefix}conv_block{i}.conv1.weight" in sd:
        base = f"conv_block{i}"
        blk = {"conv1": {"kernel": _conv(g(base + ".conv1.weight"))}, "bn1": bn(base + ".bn1")}
        if f"{prefix}{base}.conv2.weight" in sd:
            blk["conv2"] = {"kernel": _conv(g(base + ".conv2.weight"))}
            blk["bn2"] = bn(base + ".bn2")
        p["conv_blocks"].append(blk)
        i += 1
    for name in ("fc1", "fc_audioset"):
        p[name] = {"kernel": _t(g(name + ".weight")), "bias": g(name + ".bias")}
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


def convert_bart_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "text_branch.") -> dict:
    """HF BartModel encoder subtree -> our params pytree (models/bart.py).

    The CLAP bart branch only ever runs the encoder
    (`model.py:637-645` uses ``encoder_last_hidden_state``); decoder keys are
    ignored.
    """
    g = prefix
    num_layers = 0
    pat = re.compile(re.escape(g) + r"encoder\.layers\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            num_layers = max(num_layers, int(m.group(1)) + 1)
    p: dict = {
        "embed_tokens": np.asarray(sd[g + "encoder.embed_tokens.weight"]),
        "embed_positions": np.asarray(sd[g + "encoder.embed_positions.weight"]),
        "ln_emb": _ln(sd, g + "encoder.layernorm_embedding"),
        "layers": [],
    }
    for i in range(num_layers):
        lp = f"{g}encoder.layers.{i}."
        p["layers"].append(
            {
                "attn": {
                    "q": _lin(sd, lp + "self_attn.q_proj"),
                    "k": _lin(sd, lp + "self_attn.k_proj"),
                    "v": _lin(sd, lp + "self_attn.v_proj"),
                    "out": _lin(sd, lp + "self_attn.out_proj"),
                },
                "ln1": _ln(sd, lp + "self_attn_layer_norm"),
                "fc1": _lin(sd, lp + "fc1"),
                "fc2": _lin(sd, lp + "fc2"),
                "ln2": _ln(sd, lp + "final_layer_norm"),
            }
        )
    return p


def _seq_mlp(sd, prefix, idx=(0, 2)):
    """nn.Sequential(Linear, act, Linear) -> {fc1, fc2} (`model.py:533-537`)."""
    return {"fc1": _lin(sd, f"{prefix}.{idx[0]}"), "fc2": _lin(sd, f"{prefix}.{idx[1]}")}


def _convert_text_branch(sd: Mapping[str, np.ndarray]) -> dict:
    """Dispatch the text tower on the checkpoint's key layout
    (`model.py:494-527`): HF encoder.layer.* (roberta/bert), HF
    encoder.layers.* (bart), or the CLIP transformer whose resblocks live
    under ``text_branch.`` with token/positional embeddings on the model
    root (`model.py:505-513`)."""
    if any(k.startswith("text_branch.encoder.layers.") for k in sd):
        return convert_bart_state_dict(sd, "text_branch.")
    if any(k.startswith("text_branch.resblocks.") for k in sd):
        from audio_residual_tpu.models.openai import convert_openai_text_tower

        remapped = {
            (
                k.replace("text_branch.", "transformer.")
                if k.startswith("text_branch.")
                else k
            ): v
            for k, v in sd.items()
        }
        params, _ = convert_openai_text_tower(remapped)
        return params
    return convert_roberta_state_dict(sd, "text_branch.")


def convert_clap_state_dict(sd: Mapping[str, np.ndarray], depths=(2, 2, 6, 2)) -> dict:
    """Full CLAP checkpoint -> params pytree for
    :func:`audio_residual_tpu.models.clap.clap_apply`."""
    params = {
        "audio_branch": convert_htsat_state_dict(sd, "audio_branch.", depths),
        "text_branch": _convert_text_branch(sd),
        "audio_projection": _seq_mlp(sd, "audio_projection"),
        "text_projection": _seq_mlp(sd, "text_projection"),
        # MLPLayers: Sequential(Linear, ReLU, Dropout, Linear) -> indices 0, 3
        "audio_transform": _seq_mlp(sd, "audio_transform.sequential", idx=(0, 3)),
        "text_transform": _seq_mlp(sd, "text_transform.sequential", idx=(0, 3)),
        "logit_scale_a": np.asarray(sd["logit_scale_a"]),
        "logit_scale_t": np.asarray(sd["logit_scale_t"]),
    }
    return params


# --------------------------------------------------------------------------
# Reverse converters: our params pytrees -> reference-layout state dicts
# (numpy arrays keyed by the reference's torch names). Exact inverses of the
# loaders above — torch.load(convert(x)) == x bit-for-bit — so checkpoints
# flow back to torch users (`hook.py:75-119` consumes this layout).
# --------------------------------------------------------------------------


def _rt(x):  # kernel -> linear weight
    return np.ascontiguousarray(np.asarray(x).T)


def _rconv(x):  # HWIO -> OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(x), (3, 2, 0, 1)))


def _rlin(out, dst, p):
    out[dst + ".weight"] = _rt(p["kernel"])
    if "bias" in p:
        out[dst + ".bias"] = np.asarray(p["bias"])


def _rln(out, dst, p):
    out[dst + ".weight"] = np.asarray(p["scale"])
    out[dst + ".bias"] = np.asarray(p["bias"])


def htsat_params_to_state_dict(params: dict, prefix: str = "audio_branch.") -> dict:
    """Our HTSAT pytree -> reference `htsat.py` state-dict names."""
    sd: dict = {}
    sd[prefix + "bn0.weight"] = np.asarray(params["bn0"]["scale"])
    sd[prefix + "bn0.bias"] = np.asarray(params["bn0"]["bias"])
    sd[prefix + "bn0.running_mean"] = np.asarray(params["bn0"]["mean"])
    sd[prefix + "bn0.running_var"] = np.asarray(params["bn0"]["var"])
    sd[prefix + "patch_embed.proj.weight"] = _rconv(params["patch_embed"]["proj"]["kernel"])
    sd[prefix + "patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["proj"]["bias"])
    _rln(sd, prefix + "patch_embed.norm", params["patch_embed"]["norm"])
    for i, layer in enumerate(params["layers"]):
        for j, blk in enumerate(layer["blocks"]):
            bp = f"{prefix}layers.{i}.blocks.{j}."
            _rln(sd, bp + "norm1", blk["norm1"])
            _rlin(sd, bp + "attn.qkv", blk["attn"]["qkv"])
            _rlin(sd, bp + "attn.proj", blk["attn"]["proj"])
            sd[bp + "attn.relative_position_bias_table"] = np.asarray(
                blk["attn"]["rel_bias_table"]
            )
            _rln(sd, bp + "norm2", blk["norm2"])
            _rlin(sd, bp + "mlp.fc1", blk["mlp"]["fc1"])
            _rlin(sd, bp + "mlp.fc2", blk["mlp"]["fc2"])
        if "downsample" in layer:
            dp = f"{prefix}layers.{i}.downsample."
            _rln(sd, dp + "norm", layer["downsample"]["norm"])
            _rlin(sd, dp + "reduction", layer["downsample"]["reduction"])
    _rln(sd, prefix + "norm", params["norm"])
    sd[prefix + "tscam_conv.weight"] = _rconv(params["tscam_conv"]["kernel"])
    sd[prefix + "tscam_conv.bias"] = np.asarray(params["tscam_conv"]["bias"])
    _rlin(sd, prefix + "head", params["head"])
    return sd


def roberta_params_to_state_dict(params: dict, prefix: str = "text_branch.") -> dict:
    """Our roberta/bert pytree -> HF state-dict names."""
    sd: dict = {}
    emb = params["embeddings"]
    sd[prefix + "embeddings.word_embeddings.weight"] = np.asarray(emb["word"])
    sd[prefix + "embeddings.position_embeddings.weight"] = np.asarray(emb["position"])
    sd[prefix + "embeddings.token_type_embeddings.weight"] = np.asarray(emb["token_type"])
    _rln(sd, prefix + "embeddings.LayerNorm", emb["ln"])
    for i, lp in enumerate(params["layers"]):
        b = f"{prefix}encoder.layer.{i}."
        _rlin(sd, b + "attention.self.query", lp["attn"]["q"])
        _rlin(sd, b + "attention.self.key", lp["attn"]["k"])
        _rlin(sd, b + "attention.self.value", lp["attn"]["v"])
        _rlin(sd, b + "attention.output.dense", lp["attn"]["out"])
        _rln(sd, b + "attention.output.LayerNorm", lp["ln1"])
        _rlin(sd, b + "intermediate.dense", lp["mlp"]["fc1"])
        _rlin(sd, b + "output.dense", lp["mlp"]["fc2"])
        _rln(sd, b + "output.LayerNorm", lp["ln2"])
    _rlin(sd, prefix + "pooler.dense", params["pooler"])
    return sd


def clap_params_to_state_dict(params: dict) -> dict:
    """Our full CLAP pytree (roberta tower) -> reference CLAP state dict."""
    sd = htsat_params_to_state_dict(params["audio_branch"], "audio_branch.")
    sd.update(roberta_params_to_state_dict(params["text_branch"], "text_branch."))
    # nn.Sequential(Linear, act, Linear) -> 0 / 2; MLPLayers -> sequential.0 / .3
    _rlin(sd, "audio_projection.0", params["audio_projection"]["fc1"])
    _rlin(sd, "audio_projection.2", params["audio_projection"]["fc2"])
    _rlin(sd, "text_projection.0", params["text_projection"]["fc1"])
    _rlin(sd, "text_projection.2", params["text_projection"]["fc2"])
    _rlin(sd, "audio_transform.sequential.0", params["audio_transform"]["fc1"])
    _rlin(sd, "audio_transform.sequential.3", params["audio_transform"]["fc2"])
    _rlin(sd, "text_transform.sequential.0", params["text_transform"]["fc1"])
    _rlin(sd, "text_transform.sequential.3", params["text_transform"]["fc2"])
    sd["logit_scale_a"] = np.asarray(params["logit_scale_a"])
    sd["logit_scale_t"] = np.asarray(params["logit_scale_t"])
    return sd
