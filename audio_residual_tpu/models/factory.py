"""Model factory + JSON config registry.

Reference: `CLAP/src/laion_clap/clap_module/factory.py` — auto-scanned
``model_configs/*.json`` registry (`:26-50`), ``create_model`` (`:73-227`)
with checkpoint loading and audio-ckpt key remapping, ``list_models`` /
``add_model_config`` (`:230-263`).

Our registry ships all 21 of the reference's model configs: the 11 audio
ones (HTSAT-{tiny,base,large}, HTSAT-tiny-win-1536, PANN-{6,10,14} +
fmax/window/20s variants), verified byte-identical to the reference's
JSONs, plus the 10 CLIP-legacy vision configs (RN50/101/50x4/50x16,
ViT-B-16/32, ViT-L-14, + quickgelu variants). Deliberate extension: the
reference's scan filter requires an ``audio_cfg`` key (`factory.py:41`),
which silently drops the vision configs it ships on disk — its
``create_model("RN50", ...)`` raises even though the tower classes exist.
Here vision configs register too and build a working CLIP dual-tower via
:mod:`audio_residual_tpu.models.clip`. ``add_model_config`` lets users
register any extra config file.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import jax

from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.models import convert as convert_mod
from audio_residual_tpu.models.bart import BartConfig
from audio_residual_tpu.models.clip_text import ClipTextConfig
from audio_residual_tpu.models.htsat import HTSAT_VARIANTS, HTSATConfig
from audio_residual_tpu.models.pann import PANNConfig
from audio_residual_tpu.models.roberta import RobertaConfig

__all__ = ["list_models", "get_model_config", "add_model_config", "create_model",
           "load_checkpoint_params", "load_audio_tower_params"]

_CONFIG_DIRS = [Path(__file__).resolve().parents[2] / "configs" / "model_configs"]
_MODEL_CONFIGS: dict[str, dict] = {}


def _natural_key(s):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def _rescan():
    """(Re)scan config dirs (`factory.py:26-50`)."""
    _MODEL_CONFIGS.clear()
    for d in _CONFIG_DIRS:
        if not d.is_dir():
            continue
        for f in d.glob("*.json"):
            with open(f) as fh:
                cfg = json.load(fh)
            if "embed_dim" in cfg and "text_cfg" in cfg and (
                "audio_cfg" in cfg or "vision_cfg" in cfg
            ):
                _MODEL_CONFIGS[f.stem] = cfg
    for k in sorted(list(_MODEL_CONFIGS), key=_natural_key):
        _MODEL_CONFIGS[k] = _MODEL_CONFIGS.pop(k)


def list_models() -> list[str]:
    if not _MODEL_CONFIGS:
        _rescan()
    return list(_MODEL_CONFIGS)


def get_model_config(name: str) -> dict:
    if not _MODEL_CONFIGS:
        _rescan()
    if name not in _MODEL_CONFIGS:
        raise RuntimeError(f"Model config for {name} not found; available: {list_models()}")
    return json.loads(json.dumps(_MODEL_CONFIGS[name]))  # deep copy


def add_model_config(path: str) -> None:
    """Register an extra config file or directory (`factory.py:258-263`)."""
    p = Path(path)
    _CONFIG_DIRS.append(p if p.is_dir() else p.parent)
    _rescan()


def _amodel_to_config(model_cfg: dict, enable_fusion: bool, fusion_type: str) -> clap_mod.CLAPConfig:
    a = model_cfg["audio_cfg"]
    if a["model_type"] == "HTSAT":
        variant = HTSAT_VARIANTS[a["model_name"]]
        audio = HTSATConfig(
            num_classes=a["class_num"],
            sample_rate=a["sample_rate"],
            clip_samples=a["clip_samples"],
            mel_bins=a["mel_bins"],
            fmin=a["fmin"],
            fmax=a["fmax"],
            n_fft=a["window_size"],
            hop_size=a["hop_size"],
            enable_fusion=enable_fusion,
            fusion_type=fusion_type,
            **variant,
        )
    elif a["model_type"] == "PANN":
        audio = PANNConfig(
            model_name=a["model_name"],
            sample_rate=a["sample_rate"],
            clip_samples=a["clip_samples"],
            n_fft=a["window_size"],
            hop_size=a["hop_size"],
            mel_bins=a["mel_bins"],
            fmin=a["fmin"],
            fmax=a["fmax"],
            num_classes=a["class_num"],
            enable_fusion=enable_fusion,
            fusion_type=fusion_type,
        )
    else:
        raise RuntimeError(f"Model config for {a['model_type']} not found")
    return audio


def _tmodel_to_config(tmodel_name: str, text_cfg_json: dict, *, quick_gelu: bool = False):
    """Text-tower dispatch (`model.py:494-527`): roberta-base / bert-base-
    uncased / the config file's CLIP transformer / bart-base. ``quick_gelu``
    reaches only the CLIP transformer (the reference's ``act_layer`` switch
    applies to that branch alone, `model.py:453,479`)."""
    if tmodel_name == "roberta":
        return RobertaConfig()
    if tmodel_name == "bert":
        return RobertaConfig(
            vocab_size=30522,
            max_position_embeddings=512,
            type_vocab_size=2,
            pad_token_id=0,
            style="bert",
        )
    if tmodel_name == "transformer":
        return ClipTextConfig(
            vocab_size=text_cfg_json["vocab_size"],
            width=text_cfg_json["width"],
            heads=text_cfg_json["heads"],
            layers=text_cfg_json["layers"],
            context_length=text_cfg_json["context_length"],
            quick_gelu=quick_gelu,
        )
    if tmodel_name == "bart":
        return BartConfig()
    raise RuntimeError(f"Model config for {tmodel_name} not found.")


def create_model(
    amodel_name: str,
    tmodel_name: str = "roberta",
    pretrained: str = "",
    *,
    enable_fusion: bool = False,
    fusion_type: str = "None",
    seed: int = 0,
    pretrained_audio: str = "",
    pretrained_text: str = "",
    force_quick_gelu: bool = False,
):
    """Build (params, cfg, model_cfg_dict) for a registered model name
    (`factory.py:73-227`). ``pretrained`` may be a torch checkpoint path —
    converted via models/convert.py.

    ``tmodel_name`` dispatches the text tower like the reference
    (`model.py:494-527`): "roberta" (the published audio checkpoints' tower),
    "bert" (bert-base-uncased layout), "transformer" (the CLIP BPE tower from
    the model config's ``text_cfg``), or "bart" (bart-base encoder).

    ``pretrained_audio``: tower-only torch checkpoint, loaded over the fresh
    (or ``pretrained``) params via :func:`load_audio_tower_params`.
    ``pretrained_text`` is accepted like the reference, whose factory takes
    it and never consumes it (`factory.py:84` signature-only) — a warning
    says so rather than silently parsing.
    """
    amodel_name = amodel_name.replace("/", "-")
    model_cfg = get_model_config(amodel_name)
    if force_quick_gelu:
        # `--force-quick-gelu` (reference `factory.py:129-131`): override for
        # QuickGELU on non-OpenAI transformer towers — consumed by the CLIP
        # text/vision towers; audio towers have no gelu-variant switch
        model_cfg = {**model_cfg, "quick_gelu": True}
    if "audio_cfg" not in model_cfg:
        return _create_clip_model(model_cfg, tmodel_name, seed=seed)
    audio_cfg = _amodel_to_config(model_cfg, enable_fusion, fusion_type)
    text_cfg = _tmodel_to_config(
        tmodel_name, model_cfg["text_cfg"],
        quick_gelu=bool(model_cfg.get("quick_gelu", False)),
    )

    kwargs = dict(
        embed_dim=model_cfg["embed_dim"],
        audio=audio_cfg,
        text=text_cfg,
        text_model_type=tmodel_name,
    )
    if model_cfg["audio_cfg"]["model_type"] == "PANN":
        kwargs["audio_model_type"] = "PANN"
    cfg = clap_mod.CLAPConfig(**kwargs)

    if pretrained:
        params = load_checkpoint_params(pretrained, cfg)
    else:
        params = clap_mod.init_clap_params(jax.random.PRNGKey(seed), cfg)
    if pretrained_audio:
        params = dict(params)
        params["audio_branch"] = load_audio_tower_params(
            pretrained_audio, amodel_name, cfg
        )
    if pretrained_text:
        import logging

        logging.warning(
            "--pretrained-text is accepted for script compatibility; the "
            "reference's factory takes it and never consumes it "
            "(factory.py:84, signature-only). Load full checkpoints via "
            "--pretrained instead."
        )
    return params, cfg, model_cfg


def _create_clip_model(model_cfg: dict, tmodel_name: str, *, seed: int = 0):
    """Vision-config branch: build a CLIP dual-tower from a ``vision_cfg``
    model config (RN50/ViT-* families). These configs carry the CLIP BPE
    text tower spec in ``text_cfg``, so only ``tmodel_name="transformer"``
    is meaningful here."""
    from audio_residual_tpu.models import clip as clip_assembly
    from audio_residual_tpu.models.vision import VisionCfg

    if tmodel_name != "transformer":
        raise RuntimeError(
            f"vision model configs pair with the CLIP text tower "
            f'(tmodel_name="transformer"), got {tmodel_name!r}'
        )
    v = model_cfg["vision_cfg"]
    quick = bool(model_cfg.get("quick_gelu", False))
    layers = tuple(v["layers"]) if isinstance(v["layers"], list) else v["layers"]
    vision = VisionCfg(
        layers=layers,
        width=v["width"],
        patch_size=v["patch_size"] or 16,
        image_size=v["image_size"],
        quick_gelu=quick,
    )
    t = model_cfg["text_cfg"]
    text = ClipTextConfig(
        vocab_size=t["vocab_size"],
        width=t["width"],
        heads=t["heads"],
        layers=t["layers"],
        context_length=t["context_length"],
        quick_gelu=quick,
    )
    cfg = clip_assembly.CLIPConfig(embed_dim=model_cfg["embed_dim"], vision=vision, text=text)
    params = clip_assembly.init_clip_params(jax.random.PRNGKey(seed), cfg)
    return params, cfg, model_cfg


def load_audio_tower_params(path: str, amodel_name: str, cfg: clap_mod.CLAPConfig) -> dict:
    """``--pretrained-audio``: audio-tower-only torch checkpoints
    (`factory.py:166-217`), filename-dispatched like the reference:

    * PANN official (``Cnn14_mAP`` in the path): weights under ``model``;
    * HTSAT-codebase ckpts (basename ``PANN*``/``HTSAT*``, or official
      ``HTSAT_AudioSet_Saved``): weights under ``state_dict`` with a
      ``sed_model.`` prefix;
    * ``finetuned*``: full-model dump, already ``audio_branch.``-prefixed;
    * anything else raises like `factory.py:187`.

    The DSP extractor keys the reference skips have no equivalents here
    (the frontend is a kernel); converters simply never read them.
    """
    base = Path(path).name
    if amodel_name.startswith("PANN"):
        if "Cnn14_mAP" in path:
            import torch

            ckpt = torch.load(path, map_location="cpu", weights_only=False)["model"]
            sd = {
                "audio_branch." + k: v.detach().cpu().numpy()
                for k, v in ckpt.items()
            }
        elif base.startswith(("PANN", "finetuned")):
            sd = convert_mod.load_torch_checkpoint(path)
            sd = {k.replace("sed_model.", "audio_branch."): v for k, v in sd.items()}
        else:
            raise ValueError("Unknown audio checkpoint")
        return convert_mod.convert_pann_state_dict(sd)
    if amodel_name.startswith("HTSAT"):
        if "HTSAT_AudioSet_Saved" in path or base.startswith(("HTSAT", "finetuned")):
            sd = convert_mod.load_torch_checkpoint(path)
            sd = {k.replace("sed_model.", "audio_branch."): v for k, v in sd.items()}
        else:
            raise ValueError("Unknown audio checkpoint")
        return convert_mod.convert_htsat_state_dict(sd, "audio_branch.", cfg.audio.depths)
    raise ValueError("this audio encoder pretrained checkpoint is not support")


def load_checkpoint_params(path: str, cfg: clap_mod.CLAPConfig) -> dict:
    """Load + convert a reference torch checkpoint (full CLAP, or an
    audio-only HTS-AT ckpt with the ``sed_model.`` -> ``audio_branch.`` remap,
    `factory.py:166-217`)."""
    sd = convert_mod.load_torch_checkpoint(path)
    if any(k.startswith("sed_model.") for k in sd):
        sd = {k.replace("sed_model.", "audio_branch."): v for k, v in sd.items()}
    depths = cfg.audio.depths if hasattr(cfg.audio, "depths") else (2, 2, 6, 2)
    if any(k.startswith("text_branch.") for k in sd):
        return convert_mod.convert_clap_state_dict(sd, depths=depths)
    # audio-only checkpoint: fresh CLAP params + converted audio branch
    params = clap_mod.init_clap_params(jax.random.PRNGKey(0), cfg)
    params["audio_branch"] = convert_mod.convert_htsat_state_dict(sd, "audio_branch.", depths)
    return params


def create_model_and_transforms(*args, **kwargs):
    """API-name parity with the reference's ``create_model_and_transforms``
    (`factory.py:230-240`, which wraps ``create_model`` with image
    preprocessing transforms): for audio models the "transforms" are the
    featurization contract, returned as a callable."""
    from audio_residual_tpu.data.featurize import featurize_batch

    params, cfg, model_cfg = create_model(*args, **kwargs)
    if "audio_cfg" not in model_cfg:  # vision config: image preprocessing
        from audio_residual_tpu.data.transforms import image_transform

        preprocess = image_transform(model_cfg["vision_cfg"]["image_size"], is_train=False)
        return params, cfg, model_cfg, preprocess
    clip_samples = model_cfg["audio_cfg"]["clip_samples"]

    def preprocess(wav):
        return featurize_batch(wav, clip_samples)

    return params, cfg, model_cfg, preprocess


def convert_weights_to_bf16(params):
    """Cast floating-point >=2-D weights to bfloat16 — the TPU counterpart of
    ``convert_weights_to_fp16`` (`model.py:826-848`).

    Deliberate deviation: the reference casts biases (incl. attention
    in_proj biases) to fp16 too; here biases and norm params stay f32.
    bf16's 8-bit mantissa makes small additive terms noisier than fp16's
    10-bit, the f32 copies cost nothing on the MXU path (inputs dominate),
    and XLA fuses the mixed-precision adds for free."""
    import jax
    import jax.numpy as jnp

    def cast(p):
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating) and p.ndim >= 2:
            return p.astype(jnp.bfloat16)
        return p

    return jax.tree.map(cast, params)
