"""Checkpoint diff tool.

Reference: `CLAP/src/tests/check_ckpt.py:3-28` — ``keys_in_state_dict`` /
``check_ckpt_diff``: load two checkpoints, report per-key max-abs differences
with include/exclude filters. The reference's tool for "did training change
what I froze" and ckpt-compat checks. Works on torch checkpoints, orbax
directories, and raw params pytrees.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["keys_in_state_dict", "check_ckpt_diff", "flatten_params"]


def _load_any(path_or_tree):
    if isinstance(path_or_tree, dict):
        return flatten_params(path_or_tree)
    if isinstance(path_or_tree, str):
        if os.path.isdir(path_or_tree):  # orbax
            from audio_residual_tpu.training.checkpoints import load_checkpoint

            return flatten_params(load_checkpoint(path_or_tree))
        from audio_residual_tpu.models.convert import load_torch_checkpoint

        return load_torch_checkpoint(path_or_tree)
    raise TypeError(type(path_or_tree))


def flatten_params(tree, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}."))
    elif tree is not None:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def keys_in_state_dict(ckpt, key_include: str = "", key_exclude: str = "") -> list[str]:
    """List checkpoint keys with substring filters (`check_ckpt.py:3`)."""
    sd = _load_any(ckpt)
    keys = list(sd)
    if key_include:
        keys = [k for k in keys if key_include in k]
    if key_exclude:
        keys = [k for k in keys if key_exclude not in k]
    return keys


def check_ckpt_diff(
    ckpt_a,
    ckpt_b,
    key_include: str = "",
    key_exclude: str = "",
    *,
    verbose: bool = True,
) -> dict[str, float]:
    """Per-key max-abs diff between two checkpoints (`check_ckpt.py:11-28`).

    Keys present in only one checkpoint are reported with diff ``inf``.
    """
    a = _load_any(ckpt_a)
    b = _load_any(ckpt_b)
    keys = set(a) | set(b)
    if key_include:
        keys = {k for k in keys if key_include in k}
    if key_exclude:
        keys = {k for k in keys if key_exclude not in k}
    diffs = {}
    for k in sorted(keys):
        if k not in a or k not in b:
            diffs[k] = float("inf")
        elif a[k].shape != b[k].shape:
            diffs[k] = float("inf")
        else:
            diffs[k] = float(np.max(np.abs(a[k].astype(np.float64) - b[k].astype(np.float64)))) if a[k].size else 0.0
        if verbose and diffs[k] != 0.0:
            print(f"{k}: {diffs[k]:.3e}")
    return diffs
