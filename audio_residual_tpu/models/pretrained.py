"""Pretrained checkpoint registry + verified downloader.

Reference: `clap_module/pretrained.py:8-147` (CLIP ckpt URLs + sha256-verified
download) and `hook.py:91-119` (the four published CLAP checkpoints).

The CLAP entries are the audio-relevant registry; CLIP vision-tower entries
(RN50/ViT-*) existed in the reference for image-text reuse and are out of the
audio framework's scope — register extra URLs with :func:`register`.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request

__all__ = [
    "list_pretrained",
    "get_pretrained_url",
    "download_pretrained",
    "register",
]

_HF_BASE = "https://huggingface.co/lukewys/laion_clap/resolve/main/"

# name -> (url, sha256 or None)
_PRETRAINED: dict[str, tuple[str, str | None]] = {
    "630k-best": (_HF_BASE + "630k-best.pt", None),
    "630k-audioset-best": (_HF_BASE + "630k-audioset-best.pt", None),
    "630k-fusion-best": (_HF_BASE + "630k-fusion-best.pt", None),
    "630k-audioset-fusion-best": (_HF_BASE + "630k-audioset-fusion-best.pt", None),
    "music_speech_audioset_epoch_15_esc_89.98": (
        _HF_BASE + "music_speech_audioset_epoch_15_esc_89.98.pt", None),
    "music_audioset_epoch_15_esc_90.14": (
        _HF_BASE + "music_audioset_epoch_15_esc_90.14.pt", None),
    "music_speech_epoch_15_esc_89.25": (
        _HF_BASE + "music_speech_epoch_15_esc_89.25.pt", None),
}


def register(name: str, url: str, sha256: str | None = None) -> None:
    _PRETRAINED[name] = (url, sha256)


def list_pretrained() -> list[str]:
    return list(_PRETRAINED)


def get_pretrained_url(name: str) -> str:
    return _PRETRAINED[name][0]


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_pretrained(name: str, cache_dir: str = "~/.cache/clap") -> str:
    """Idempotent verified download (`pretrained.py:100-147` semantics).
    Requires network egress; raises with a clear message otherwise."""
    url, expected = _PRETRAINED[name]
    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    target = os.path.join(cache_dir, os.path.basename(url))
    if os.path.exists(target):
        if expected is None or _sha256(target) == expected:
            return target
        os.remove(target)  # checksum mismatch -> redownload
    try:
        urllib.request.urlretrieve(url, target)
    except Exception as e:
        raise RuntimeError(
            f"download of {name} from {url} failed ({e}); place the file at "
            f"{target} manually in egress-restricted environments"
        ) from e
    if expected is not None and _sha256(target) != expected:
        raise RuntimeError(f"{name}: sha256 mismatch after download")
    return target
