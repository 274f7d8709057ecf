"""Checkpoint save/resume with top-K rotation.

Reference: `training/main.py:36-101,429-465,534-570` — per-epoch
``epoch_{n}.pt`` files holding {epoch, name, state_dict, optimizer},
``epoch_latest.pt`` under --save-most-recent, and a top-K rotation keyed on
the eval metric (``maintain_ckpts`` / ``update_top_k_performance``).

TPU-native: orbax-checkpoint for the params/opt-state pytrees (async-capable,
sharding-aware for multi-host), same rotation semantics. Also exposes
``save_torch_compatible`` to emit a reference-layout torch state dict so
checkpoints flow back to torch users.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_most_recent",
    "maintain_ckpts",
    "update_top_k_performance",
    "save_torch_compatible",
]


def save_torch_compatible(path: str, params: dict, *, epoch: int = 0, name: str = "") -> str:
    """Export our CLAP params as a reference-layout torch checkpoint
    (`main.py:534-561` schema: {epoch, name, state_dict}) so the file loads
    in the reference via `hook.py:75-119` — and back into this framework via
    ``factory.load_checkpoint_params`` / ``CLAPModule.load_ckpt``, bit-for-bit
    (tests/test_api.py round-trip)."""
    import torch

    from audio_residual_tpu.models.convert import clap_params_to_state_dict

    sd = {k: torch.from_numpy(v.copy()) for k, v in clap_params_to_state_dict(params).items()}
    torch.save({"epoch": epoch, "name": name, "state_dict": sd}, path)
    return path


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: dict, epoch: int, name: str = "") -> str:
    """Write ``epoch_{n}`` (params + opt state + step) plus metadata."""
    path = os.path.join(ckpt_dir, f"epoch_{epoch}")
    if os.path.exists(path):
        shutil.rmtree(path)
    _ckptr().save(os.path.abspath(path), state)
    with open(os.path.join(ckpt_dir, f"epoch_{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, "name": name}, f)
    return path


def load_checkpoint(path: str, target: dict | None = None) -> dict:
    """Restore a checkpoint; ``target`` provides the pytree structure (and
    shardings, when its leaves carry them)."""
    import orbax.checkpoint as ocp

    return _ckptr().restore(os.path.abspath(path), item=target)


def save_most_recent(ckpt_dir: str, state: dict) -> str:
    path = os.path.join(ckpt_dir, "epoch_latest")
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(os.path.abspath(tmp), state)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def maintain_ckpts(ckpt_dir: str, base_name: str, how_many: int) -> None:
    """Rotation helper (`main.py:36-47`): shift ``{base}_{i}`` up by one and
    drop the oldest beyond ``how_many``."""
    for i in range(how_many - 1, -1, -1):
        p = os.path.join(ckpt_dir, f"{base_name}_{i}")
        if os.path.exists(p):
            target = os.path.join(ckpt_dir, f"{base_name}_{i + 1}")
            if os.path.exists(target):
                shutil.rmtree(target)
            os.replace(p, target)
    overflow = os.path.join(ckpt_dir, f"{base_name}_{how_many}")
    if os.path.exists(overflow):
        shutil.rmtree(overflow)


def update_top_k_performance(
    new_metric: float,
    current_top_k: dict[int, float],
    ckpt_dir: str,
    state: dict,
    *,
    bigger_better: bool = True,
    base_name: str = "pretrain_performance",
) -> dict[int, float]:
    """Top-K checkpoint tracker (`main.py:50-101`): if the new metric beats
    slot k, shift slots k..K down and save into slot k."""
    ranks = sorted(current_top_k, key=lambda i: i)
    for k in ranks:
        best = current_top_k[k]
        better = new_metric > best if bigger_better else new_metric < best
        if better:
            # shift k.. down by one
            for i in range(max(ranks), k, -1):
                src = os.path.join(ckpt_dir, f"{base_name}_{i - 1}")
                if os.path.exists(src):
                    dst = os.path.join(ckpt_dir, f"{base_name}_{i}")
                    if os.path.exists(dst):
                        shutil.rmtree(dst)
                    os.replace(src, dst)
                current_top_k[i] = current_top_k[i - 1]
            p = os.path.join(ckpt_dir, f"{base_name}_{k}")
            if os.path.exists(p):
                shutil.rmtree(p)
            _ckptr().save(os.path.abspath(p), state)
            current_top_k[k] = new_metric
            break
    return current_top_k
