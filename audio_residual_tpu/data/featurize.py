"""Waveform featurization — THE data contract of the reference
(``get_audio_features``, `CLAP/src/laion_clap/training/data.py:402-506`).

Two implementations:

  * :func:`featurize_batch` — TPU-first, fully jittable, whole-batch. Static
    input length (per-dataset), so repeat counts and pad amounts are compile
    time constants; ``rand_trunc`` crops are a vectorised dynamic-slice. This
    replaces the reference's per-sample host Python loop
    (`hook.py:174-188`) that dominated its CPU time (SURVEY.md §3.1).
  * :func:`get_audio_features` — host-side numpy mirror of the reference API
    (dict-in/dict-out, per sample) for dataloader-level compatibility,
    including the fusion mel stack.

Semantics matched:
  * too long: ``rand_trunc`` = random crop to ``max_len`` (``longer=True``),
    or ``fusion`` = global shrunk mel + 3 random chunk mels stacked
    ``[4, chunk_frames, n_mels]`` (`data.py:420-466`). (The reference's
    ``np.random.integers`` AttributeError on the long/non-fusion crop at
    `data.py:467` is a latent bug — we implement the intended randint.)
  * too short: ``repeatpad`` = tile ``max_len // len`` times then zero-pad
    (`data.py:472-482`), ``pad`` = zero-pad, ``repeat`` = tile then truncate.
  * fusion + short: mel stacked 4x identical (`data.py:499-502`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.ops import frontend, interpolate

__all__ = ["featurize_batch", "get_audio_features", "get_mel", "fusion_mel"]


def _fusion_frontend_cfg(audio_cfg: dict) -> frontend.FrontendConfig:
    """torchaudio-semantics mel (htk scale, no norm) used by `get_mel`
    (`data.py:363-399`)."""
    return frontend.FrontendConfig(
        sample_rate=audio_cfg["sample_rate"],
        n_fft=audio_cfg["window_size"],
        hop_length=audio_cfg["hop_size"],
        win_length=audio_cfg["window_size"],
        n_mels=audio_cfg["mel_bins"],
        fmin=audio_cfg["fmin"],
        fmax=audio_cfg["fmax"],
        mel_scale="htk",
        mel_norm=None,
    )


def get_mel(audio_data: jnp.ndarray, audio_cfg: dict) -> jnp.ndarray:
    """``[T] -> [frames, n_mels]`` log-mel with torchaudio semantics."""
    return frontend.logmel(audio_data, _fusion_frontend_cfg(audio_cfg))


@functools.partial(jax.jit, static_argnames=("max_len", "data_truncating", "data_filling"))
def featurize_batch(
    wav: jnp.ndarray,
    max_len: int = 480000,
    *,
    data_truncating: str = "rand_trunc",
    data_filling: str = "repeatpad",
    rng: jax.Array | None = None,
) -> dict:
    """Batched featurization: ``[B, T] -> {"waveform": [B, max_len],
    "longer": [B]}``. T is static; all samples share one branch (the
    per-dataset common case — ESC-50 is always 240000).

    ``rand_trunc`` crops at random positions like the reference
    (`data.py:465-468`); pass ``rng`` to vary crops across calls — the
    ResiDual train step folds a per-step rng in (`train_residual.py`),
    while eval paths pass ``rng=None`` so a fixed seed keeps the crop
    random-positioned but deterministic across runs.
    """
    b, t = wav.shape
    if t > max_len:
        longer = jnp.ones((b,), bool)
        if data_truncating == "rand_trunc":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            starts = jax.random.randint(rng, (b,), 0, t - max_len + 1)
            idx = starts[:, None] + jnp.arange(max_len)[None, :]
            wav = jnp.take_along_axis(wav, idx, axis=1)
        else:
            raise NotImplementedError(
                f"batched data_truncating={data_truncating!r}; use get_audio_features"
            )
    elif t < max_len:
        longer = jnp.zeros((b,), bool)
        if data_filling == "repeatpad":
            n_repeat = max_len // t
            wav = jnp.tile(wav, (1, n_repeat))
            wav = jnp.pad(wav, ((0, 0), (0, max_len - wav.shape[1])))
        elif data_filling == "pad":
            wav = jnp.pad(wav, ((0, 0), (0, max_len - t)))
        elif data_filling == "repeat":
            n_repeat = max_len // t + 1
            wav = jnp.tile(wav, (1, n_repeat))[:, :max_len]
        else:
            raise NotImplementedError(f"data_filling {data_filling!r}")
    else:
        longer = jnp.zeros((b,), bool)
    return {"waveform": wav, "longer": longer}


def fusion_mel(
    audio_data: np.ndarray,
    max_len: int,
    audio_cfg: dict,
    rng: np.random.Generator,
) -> tuple[np.ndarray, bool]:
    """Fusion mel stack for one long clip (`data.py:420-460`):
    global shrunk mel + 3 random chunks, ``[4, chunk_frames, n_mels]``."""
    mel = np.asarray(get_mel(jnp.asarray(audio_data), audio_cfg))  # [T, F]
    chunk_frames = max_len // audio_cfg["hop_size"] + 1
    total_frames = mel.shape[0]
    if chunk_frames == total_frames:
        return np.stack([mel] * 4), False
    ranges = np.array_split(list(range(0, total_frames - chunk_frames + 1)), 3)
    if len(ranges[1]) == 0:
        ranges[1] = np.array([0])
    if len(ranges[2]) == 0:
        ranges[2] = np.array([0])
    idx_front = rng.choice(ranges[0])
    idx_middle = rng.choice(ranges[1])
    idx_back = rng.choice(ranges[2])
    chunks = [mel[i : i + chunk_frames] for i in (idx_front, idx_middle, idx_back)]
    shrink = np.asarray(
        interpolate.resize_bilinear_antialias(
            jnp.asarray(mel), chunk_frames, audio_cfg["mel_bins"]
        )
    )
    return np.stack([shrink, *chunks]), True


def get_audio_features(
    sample: dict,
    audio_data: np.ndarray,
    max_len: int = 480000,
    data_truncating: str = "rand_trunc",
    data_filling: str = "repeatpad",
    audio_cfg: dict | None = None,
    rng: np.random.Generator | None = None,
) -> dict:
    """Per-sample host-side mirror of the reference API (`data.py:402-506`).

    Mutates and returns ``sample`` with ``waveform`` (np.float32 [max_len])
    and ``longer`` (bool); for fusion also ``mel_fusion``.
    """
    rng = rng or np.random.default_rng()
    audio_data = np.asarray(audio_data, dtype=np.float32)
    if audio_cfg is None:
        audio_cfg = dict(
            sample_rate=48000, window_size=1024, hop_size=480, mel_bins=64,
            fmin=50, fmax=14000,
        )

    n = len(audio_data)
    longer = False
    if n > max_len:
        if data_truncating == "rand_trunc":
            longer = True
        elif data_truncating == "fusion":
            sample["mel_fusion"], longer = fusion_mel(audio_data, max_len, audio_cfg, rng)
        else:
            raise NotImplementedError(f"data_truncating {data_truncating!r}")
        start = int(rng.integers(0, n - max_len + 1))
        audio_data = audio_data[start : start + max_len]
    elif n < max_len:
        if data_filling == "repeatpad":
            audio_data = np.tile(audio_data, max_len // n)
            audio_data = np.pad(audio_data, (0, max_len - len(audio_data)))
        elif data_filling == "pad":
            audio_data = np.pad(audio_data, (0, max_len - n))
        elif data_filling == "repeat":
            audio_data = np.tile(audio_data, max_len // n + 1)[:max_len]
        else:
            raise NotImplementedError(f"data_filling {data_filling!r}")
        if data_truncating == "fusion":
            mel = np.asarray(get_mel(jnp.asarray(audio_data), audio_cfg))
            sample["mel_fusion"] = np.stack([mel] * 4)
    else:
        if data_truncating == "fusion":
            mel = np.asarray(get_mel(jnp.asarray(audio_data), audio_cfg))
            sample["mel_fusion"] = np.stack([mel] * 4)

    sample["longer"] = longer
    sample["waveform"] = audio_data.astype(np.float32)
    return sample
