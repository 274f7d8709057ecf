"""Load the ACTUAL reference HTSAT implementation as a numerical oracle.

We import `/root/reference/CLAP/src/laion_clap/clap_module/htsat.py` directly
(read-only; nothing is copied into this repo) with shims for its missing
third-party deps:

  * ``torchlibrosa.stft.Spectrogram`` -> torch.stft (same semantics: hann
    periodic window, center reflect pad, power 2) — itself validated against
    our JAX frontend in test_frontend.py;
  * ``torchlibrosa.stft.LogmelFilterBank`` -> our mel filterbank matrix
    (validated against transformers' librosa-parity mel_filter_bank) + the
    reference's log semantics;
  * ``torchlibrosa.augmentation.SpecAugmentation`` -> eval-mode no-op
    (parity tests run in eval);
  * ``torchvision.ops.misc.FrozenBatchNorm2d`` -> alias of nn.BatchNorm2d
    (imported by clap_module/utils.py but unused in the HTSAT path).

This lets parity tests compare our JAX model against the true reference
forward, weight-for-weight, rather than against a re-implementation.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF_DIR = "/root/reference/CLAP/src/laion_clap/clap_module"


def _install_shims():
    if "torchlibrosa" in sys.modules:
        return

    from audio_residual_tpu.ops import frontend as fe

    class Spectrogram(nn.Module):
        def __init__(self, n_fft, hop_length, win_length, window="hann", center=True,
                     pad_mode="reflect", freeze_parameters=True, power=2.0):
            super().__init__()
            assert window == "hann" and center and pad_mode == "reflect"
            self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
            self.register_buffer("window_t", torch.hann_window(win_length, periodic=True))

        def forward(self, x):  # [B, T] -> [B, 1, frames, bins]
            spec = torch.stft(
                x, n_fft=self.n_fft, hop_length=self.hop, win_length=self.win,
                window=self.window_t, center=True, pad_mode="reflect", return_complex=True,
            )
            return (spec.abs() ** 2).transpose(-1, -2)[:, None]

    class LogmelFilterBank(nn.Module):
        def __init__(self, sr, n_fft, n_mels, fmin, fmax, ref=1.0, amin=1e-10,
                     top_db=None, freeze_parameters=True):
            super().__init__()
            cfg = fe.FrontendConfig(
                sample_rate=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax,
                ref=ref, amin=amin, top_db=top_db,
            )
            self.amin, self.ref, self.top_db = amin, ref, top_db
            self.register_buffer("melW", torch.from_numpy(fe.mel_filterbank(cfg)))

        def forward(self, x):  # [B, 1, frames, bins] -> [B, 1, frames, mels]
            mel = torch.matmul(x, self.melW)
            log_spec = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
            log_spec -= 10.0 * np.log10(max(self.amin, self.ref))
            return log_spec

    class SpecAugmentation(nn.Module):
        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):
            if self.training:
                raise NotImplementedError("oracle is eval-only")
            return x

    tl = types.ModuleType("torchlibrosa")
    tl_stft = types.ModuleType("torchlibrosa.stft")
    tl_stft.Spectrogram = Spectrogram
    tl_stft.LogmelFilterBank = LogmelFilterBank
    tl_aug = types.ModuleType("torchlibrosa.augmentation")
    tl_aug.SpecAugmentation = SpecAugmentation
    tl.stft, tl.augmentation = tl_stft, tl_aug
    sys.modules["torchlibrosa"] = tl
    sys.modules["torchlibrosa.stft"] = tl_stft
    sys.modules["torchlibrosa.augmentation"] = tl_aug

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_misc = types.ModuleType("torchvision.ops.misc")
        tv_misc.FrozenBatchNorm2d = nn.BatchNorm2d
        tv_ops.misc = tv_misc
        tv.ops = tv_ops
        # a real ModuleSpec so importlib.util.find_spec("torchvision") (used
        # by transformers' import probing) doesn't raise on __spec__ is None
        for name, mod in (
            ("torchvision", tv),
            ("torchvision.ops", tv_ops),
            ("torchvision.ops.misc", tv_misc),
        ):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod


def _load_ref_package():
    """Import the reference clap_module as package 'ref_clap' from REF_DIR."""
    if "ref_clap" in sys.modules:
        return sys.modules["ref_clap"]
    _install_shims()
    pkg = types.ModuleType("ref_clap")
    pkg.__path__ = [REF_DIR]
    pkg.__package__ = "ref_clap"
    sys.modules["ref_clap"] = pkg
    for name in ("utils", "feature_fusion", "htsat", "pann_model", "timm_model",
                 "model", "loss"):
        spec = importlib.util.spec_from_file_location(
            f"ref_clap.{name}", f"{REF_DIR}/{name}.py",
            submodule_search_locations=None,
        )
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "ref_clap"
        sys.modules[f"ref_clap.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    # The reference CLAP hard-codes HF from_pretrained downloads
    # (`model.py:496-516`); this environment is offline, and parity tests share
    # *random* weights anyway — swap in config-built local models.
    pkg.model.RobertaModel = _offline_hf("RobertaModel")
    pkg.model.BertModel = _offline_hf("BertModel")
    pkg.model.BartModel = _offline_hf("BartModel")
    return pkg


def _offline_hf(cls_name: str):
    """HF model class whose from_pretrained builds from the matching base
    config instead of downloading (roberta-base / bert-base-uncased /
    bart-base dims)."""
    import transformers

    base = getattr(transformers, cls_name)
    configs = {
        # HF RobertaConfig *defaults* are bert-like (512 pos / type_vocab 2);
        # real roberta-base uses 514 learned positions and one token type
        "RobertaModel": lambda: transformers.RobertaConfig(
            max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
            bos_token_id=0, eos_token_id=2,
        ),
        "BertModel": transformers.BertConfig,  # defaults = bert-base-uncased
        "BartModel": lambda: transformers.BartConfig(  # HF defaults are -large
            d_model=768, encoder_layers=6, decoder_layers=6,
            encoder_attention_heads=12, decoder_attention_heads=12,
            encoder_ffn_dim=3072, decoder_ffn_dim=3072,
        ),
    }

    class Offline(base):
        @classmethod
        def from_pretrained(cls, name, *args, **kwargs):
            return cls(configs[cls_name]())

    Offline.__name__ = f"Offline{cls_name}"
    return Offline


class _AudioCfg:
    """Attribute-style audio config for HTSAT_Swin_Transformer(config=...)."""

    def __init__(self, **kw):
        defaults = dict(
            sample_rate=48000, clip_samples=480000, window_size=1024, hop_size=480,
            mel_bins=64, fmin=50, fmax=14000, class_num=527,
            model_type="HTSAT", model_name="tiny",
        )
        defaults.update(kw)
        self.__dict__.update(defaults)


def build_reference_htsat(cfg_overrides: dict | None = None, **model_kw) -> nn.Module:
    """Instantiate the reference HTSAT_Swin_Transformer (tiny by default)."""
    pkg = _load_ref_package()
    audio_cfg = _AudioCfg(**(cfg_overrides or {}))
    model = pkg.htsat.HTSAT_Swin_Transformer(
        spec_size=256, patch_size=4, patch_stride=(4, 4),
        num_classes=audio_cfg.class_num, embed_dim=96, depths=[2, 2, 6, 2],
        num_heads=[4, 8, 16, 32], window_size=8, config=audio_cfg,
        enable_fusion=False, fusion_type="None", **model_kw,
    )
    model.eval()
    return model


def _to_torch_sd(sd_np: dict) -> dict[str, torch.Tensor]:
    return {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
        for k, v in sd_np.items()
    }


def jax_params_to_torch_state(params: dict, prefix: str = "") -> dict[str, torch.Tensor]:
    """Our HTSAT pytree -> reference state_dict (delegates to the package's
    reverse converter so tests exercise the shipping export path)."""
    from audio_residual_tpu.models.convert import htsat_params_to_state_dict

    return _to_torch_sd(htsat_params_to_state_dict(params, prefix))


def load_jax_params_into_reference(model: nn.Module, params: dict) -> None:
    sd = jax_params_to_torch_state(params)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # buffers the torch model generates itself (DSP bases, masks, indices)
    allowed = ("spectrogram_extractor", "logmel_extractor", "window_t", "melW",
               "attn_mask", "relative_position_index")
    bad = [m for m in missing if not any(a in m for a in allowed)]
    assert not bad, f"missing keys: {bad}"
    assert not unexpected, f"unexpected keys: {unexpected}"


def build_reference_clap(tmodel: str = "roberta", **kw) -> nn.Module:
    """Instantiate the full reference CLAP (`model.py:422-549`), HTSAT-tiny
    audio branch, offline text towers."""
    pkg = _load_ref_package()
    audio_cfg = pkg.model.CLAPAudioCfp(
        model_type="HTSAT", model_name="tiny", sample_rate=48000,
        window_size=1024, hop_size=480, fmin=50, fmax=14000,
        class_num=527, mel_bins=64, clip_samples=480000,
    )
    text_cfg = pkg.model.CLAPTextCfg(
        context_length=77, vocab_size=49408, width=512, heads=8, layers=12,
        model_type=tmodel,
    )
    model = pkg.model.CLAP(
        embed_dim=768, audio_cfg=audio_cfg, text_cfg=text_cfg,
        quick_gelu=False, enable_fusion=False, fusion_type="None", **kw,
    )
    model.eval()
    return model


def clap_params_to_torch_state(params: dict) -> dict:
    """Our full CLAP pytree -> the reference CLAP state_dict (delegates to
    the package's reverse converter)."""
    from audio_residual_tpu.models.convert import clap_params_to_state_dict

    return _to_torch_sd(clap_params_to_state_dict(params))


def load_jax_params_into_reference_clap(model: nn.Module, params: dict) -> None:
    sd = clap_params_to_torch_state(params)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    allowed = ("spectrogram_extractor", "logmel_extractor", "window_t", "melW",
               "attn_mask", "relative_position_index", "position_ids")
    bad = [m for m in missing if not any(a in m for a in allowed)]
    assert not bad, f"missing keys: {bad}"
    assert not unexpected, f"unexpected keys: {unexpected}"


def _install_research_shims():
    """Shims needed to import the reference's `src/` research layer verbatim.

    The real deps are either offline-hostile (`wandb`) or absent in this
    image (`librosa`, `torchaudio`, `webdataset` — pulled in transitively by
    `data_processing.processing`). The shims carry ONLY what module import
    touches; any actual use raises.
    """
    import importlib.machinery

    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.__spec__ = importlib.machinery.ModuleSpec("wandb", loader=None)

        class _Run:
            name = "stub"
            summary: dict = {}

        wandb.run = _Run()
        wandb.init = lambda *a, **k: None
        wandb.log = lambda *a, **k: None
        wandb.finish = lambda *a, **k: None
        wandb.Histogram = lambda *a, **k: None
        sys.modules["wandb"] = wandb
    import importlib.machinery

    for name in ("librosa", "torchaudio", "torchaudio.transforms"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a real ModuleSpec so importlib.util.find_spec (transformers'
            # dependency probing) doesn't raise on __spec__ is None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
    if not hasattr(sys.modules["torchaudio"], "transforms"):
        sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]


def _ref_get_audio_features(sample, audio_data, max_len, data_truncating,
                            data_filling, audio_cfg, require_grad=False):
    """Torch `get_audio_features` with the reference's exact non-fusion
    semantics (`training/data.py:402-506`) for the research-loop oracle.

    The real function's module (`data.py`) is un-importable offline (it
    downloads three HF tokenizers at import time and needs webdataset/wget);
    this mirror covers the paths the `src/` loops exercise — repeatpad /
    pad / repeat fill and the rand_trunc marker. Fusion asserts out: the
    research loops run non-fusion HTSAT-tiny only.
    """
    import contextlib

    import torch.nn.functional as F

    grad_fn = contextlib.suppress if require_grad else torch.no_grad
    with grad_fn():
        if len(audio_data) > max_len:
            assert data_truncating == "rand_trunc", "oracle shim: non-fusion only"
            longer = torch.tensor([True])
            overflow = len(audio_data) - max_len
            # reference data.py:467 calls np.random.integers (an
            # AttributeError at runtime — SURVEY §2.2 landmine); the intended
            # randint is used here, as in our featurize mirror
            idx = np.random.randint(0, overflow + 1)
            audio_data = audio_data[idx : idx + max_len]
        else:
            if len(audio_data) < max_len:
                if data_filling == "repeatpad":
                    n_repeat = int(max_len / len(audio_data))
                    audio_data = audio_data.repeat(n_repeat)
                    audio_data = F.pad(audio_data, (0, max_len - len(audio_data)))
                elif data_filling == "pad":
                    audio_data = F.pad(audio_data, (0, max_len - len(audio_data)))
                elif data_filling == "repeat":
                    n_repeat = int(max_len / len(audio_data))
                    audio_data = audio_data.repeat(n_repeat + 1)[:max_len]
                else:
                    raise NotImplementedError(data_filling)
            longer = torch.tensor([False])
    sample["longer"] = longer
    sample["waveform"] = audio_data
    return sample


def load_ref_research():
    """Import `/root/reference/src/` (the L4 research layer) verbatim as
    package ``src``, with its `CLAP` / `data_processing` imports satisfied.

    `CLAP` resolves to a shim module exposing the three symbols the research
    code imports from it (`get_audio_features`, `int16_to_float32`,
    `float32_to_int16` — `CLAP/__init__.py:1`); `data_processing` resolves
    to a stub carrying the real `DATASETS` registry (re-read from
    `download_utils.py`, whose siblings need torchaudio/librosa).
    Returns the loaded ``src`` package.
    """
    if "src" in sys.modules and getattr(sys.modules["src"], "_ref_oracle", False):
        return sys.modules["src"]
    _install_shims()
    _install_research_shims()

    clap_shim = types.ModuleType("CLAP")
    clap_shim.get_audio_features = _ref_get_audio_features
    clap_shim.int16_to_float32 = lambda x: (x / 32767.0).astype("float32")

    def float32_to_int16(x):
        x = np.clip(x, a_min=-1.0, a_max=1.0)
        return (x * 32767.0).astype("int16")

    clap_shim.float32_to_int16 = float32_to_int16
    sys.modules["CLAP"] = clap_shim

    # data_processing: only DATASETS is touched by src/evaluation.py; load
    # the genuine registry module (pandas-only deps) without the package's
    # __init__ (which drags in torchaudio/librosa via audio_dataset)
    dl_spec = importlib.util.spec_from_file_location(
        "ref_download_utils", "/root/reference/data_processing/download_utils.py"
    )
    dl = importlib.util.module_from_spec(dl_spec)
    dl_spec.loader.exec_module(dl)
    dp = types.ModuleType("data_processing")
    dp.DATASETS = dl.DATASETS
    dp.get_dataframe = dl.get_dataframe
    dp.download_dataset = dl.download_dataset
    sys.modules["data_processing"] = dp

    spec = importlib.util.spec_from_file_location(
        "src", "/root/reference/src/__init__.py",
        submodule_search_locations=["/root/reference/src"],
    )
    src = importlib.util.module_from_spec(spec)
    sys.modules["src"] = src
    spec.loader.exec_module(src)
    src._ref_oracle = True
    return src


class RefCLAPModule(nn.Module):
    """Minimal stand-in for the reference `CLAP_Module` (`hook.py:21-218`)
    carrying the two members the `src/` research loops use: ``.model`` (the
    GENUINE reference CLAP from `model.py`) and
    ``get_audio_embedding_from_data`` with `hook.py:158-191` semantics
    (per-sample int16 round-trip + get_audio_features loop + the genuine
    `model.get_audio_embedding`). The real hook.py is un-importable offline
    (librosa/wget + pretrained downloads)."""

    def __init__(self, model: nn.Module, audio_cfg: dict | None = None):
        super().__init__()
        self.model = model
        self.enable_fusion = False
        self.model_cfg = {
            "audio_cfg": audio_cfg
            or dict(sample_rate=48000, window_size=1024, hop_size=480,
                    mel_bins=64, fmin=50, fmax=14000, clip_samples=480000)
        }

    def get_audio_embedding_from_data(self, x, use_tensor=False, data_fil="repeatpad"):
        clap_shim = sys.modules["CLAP"]
        self.model.eval()  # hook.py:173 — eval-mode even inside train loops
        audio_input = []
        for audio_waveform in x:
            if not use_tensor:
                audio_waveform = clap_shim.int16_to_float32(
                    clap_shim.float32_to_int16(audio_waveform)
                )
                audio_waveform = torch.from_numpy(audio_waveform).float()
            temp_dict = {}
            temp_dict = clap_shim.get_audio_features(
                temp_dict, audio_waveform, 480000,
                data_truncating="rand_trunc", data_filling=data_fil,
                audio_cfg=self.model_cfg["audio_cfg"],
                require_grad=audio_waveform.requires_grad,
            )
            audio_input.append(temp_dict)
        audio_embed = self.model.get_audio_embedding(audio_input)
        if not use_tensor:
            audio_embed = audio_embed.detach().cpu().numpy()
        return audio_embed


def build_reference_pann(model_name: str = "Cnn14", **cfg_overrides) -> nn.Module:
    """Instantiate a reference PANN model (Cnn6/Cnn10/Cnn14)."""
    pkg = _load_ref_package()
    audio_cfg = _AudioCfg(model_type="PANN", model_name=model_name, **cfg_overrides)
    cls = getattr(pkg.pann_model, model_name)
    model = cls(
        sample_rate=audio_cfg.sample_rate, window_size=audio_cfg.window_size,
        hop_size=audio_cfg.hop_size, mel_bins=audio_cfg.mel_bins,
        fmin=audio_cfg.fmin, fmax=audio_cfg.fmax, classes_num=audio_cfg.class_num,
        enable_fusion=False, fusion_type="None",
    )
    model.eval()
    return model


def pann_params_to_torch_state(params: dict) -> dict[str, torch.Tensor]:
    """Our PANN pytree -> reference state_dict (eval-path params only)."""
    sd: dict[str, torch.Tensor] = {}

    def T(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))

    def bn(dst, p):
        sd[dst + ".weight"] = T(p["scale"])
        sd[dst + ".bias"] = T(p["bias"])
        sd[dst + ".running_mean"] = T(p["mean"])
        sd[dst + ".running_var"] = T(p["var"])

    bn("bn0", params["bn0"])
    for i, blk in enumerate(params["conv_blocks"]):
        base = f"conv_block{i+1}"
        sd[base + ".conv1.weight"] = T(blk["conv1"]["kernel"]).permute(3, 2, 0, 1).contiguous()
        bn(base + ".bn1", blk["bn1"])
        if "conv2" in blk:
            sd[base + ".conv2.weight"] = T(blk["conv2"]["kernel"]).permute(3, 2, 0, 1).contiguous()
            bn(base + ".bn2", blk["bn2"])
    for name in ("fc1", "fc_audioset"):
        sd[name + ".weight"] = T(params[name]["kernel"]).T.contiguous()
        sd[name + ".bias"] = T(params[name]["bias"])
    return sd


def load_jax_params_into_reference_pann(model: nn.Module, params: dict) -> None:
    sd = pann_params_to_torch_state(params)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    allowed = ("spectrogram_extractor", "logmel_extractor", "window_t", "melW",
               "num_batches_tracked")
    bad = [m for m in missing if not any(a in m for a in allowed)]
    assert not bad, f"missing keys: {bad}"
    assert not unexpected, f"unexpected keys: {unexpected}"


def load_ref_train_get_metrics():
    """Verbatim ``get_metrics`` from the reference's in-training evaluate
    (`training/train.py:504-574`), extracted by AST so the module-level
    imports (wandb, webdataset, clap_module CLI deps) never run."""
    import ast
    import os

    import torch.nn.functional as F

    path = os.path.join(os.path.dirname(REF_DIR), "training", "train.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    fn = next(
        node for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name == "get_metrics"
    )
    ns = {"torch": torch, "np": np, "F": F}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), path, "exec"), ns)
    return ns["get_metrics"]


def load_ref_dcase_get_metrics(n_texts: int):
    """Verbatim ``get_metrics`` from the reference's DCASE eval
    (`evaluate/eval_dcase.py:33-48`), extracted by AST so its module-level
    imports (open_clip, librosa) never run.

    The reference function reads the module-global ``text_features`` for the
    5-captions-per-audio ground truth (a scoping leak from ``__main__`` in
    the reference); the exec namespace provides one of the requested length.
    """
    import ast
    import os

    path = os.path.join(
        os.path.dirname(REF_DIR), "evaluate", "eval_dcase.py"
    )
    with open(path) as f:
        tree = ast.parse(f.read())
    fn = next(
        node for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name == "get_metrics"
    )
    ns = {"torch": torch, "np": np, "text_features": list(range(n_texts))}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), path, "exec"), ns)
    return ns["get_metrics"]
