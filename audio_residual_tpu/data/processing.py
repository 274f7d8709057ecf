"""Host/device audio processing toolbox.

Reference: `data_processing/processing.py:11-188` (``AudioProcessing``):
load / to_channels / to_sample_rate / to_length (random-position pad) /
time_shift augment / MelSpectrogram+AmplitudeToDB / SpecAugment-style
time-freq masking / plotting helpers.

JAX/numpy equivalents; the mel path reuses the validated frontend kernels
(torchaudio-semantics htk mel, `processing.py:102-120`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from audio_residual_tpu.data.datasets import load_wav, resample_poly
from audio_residual_tpu.ops import frontend
from audio_residual_tpu.ops.spec_augment import drop_stripes

__all__ = ["AudioProcessing"]


class AudioProcessing:
    """Static-method toolbox mirroring the reference class."""

    @staticmethod
    def load(path: str):
        wav, sr = load_wav(path)
        return wav, sr

    @staticmethod
    def to_channels(wav: np.ndarray, channels: int) -> np.ndarray:
        """Mono <-> multi-channel (`processing.py:30-43`)."""
        if wav.ndim == 1:
            wav = wav[None]
        if wav.shape[0] == channels:
            return wav
        if channels == 1:
            return wav.mean(0, keepdims=True)
        return np.broadcast_to(wav[:1], (channels, wav.shape[1])).copy()

    @staticmethod
    def to_sample_rate(wav: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
        return resample_poly(wav, sr, target_sr)

    @staticmethod
    def to_length(wav: np.ndarray, target_len: int, rng=None) -> np.ndarray:
        """Pad at a random position / truncate (`processing.py:60-80`)."""
        rng = rng or np.random.default_rng()
        n = wav.shape[-1]
        if n > target_len:
            start = int(rng.integers(0, n - target_len + 1))
            return wav[..., start : start + target_len]
        if n < target_len:
            pad = target_len - n
            left = int(rng.integers(0, pad + 1))
            width = [(0, 0)] * (wav.ndim - 1) + [(left, pad - left)]
            return np.pad(wav, width)
        return wav

    @staticmethod
    def time_shift(wav: np.ndarray, max_shift_pct: float = 0.4, rng=None) -> np.ndarray:
        """Circular time-shift augmentation (`processing.py:83-90`)."""
        rng = rng or np.random.default_rng()
        shift = int(rng.integers(0, int(wav.shape[-1] * max_shift_pct) + 1))
        return np.roll(wav, shift, axis=-1)

    @staticmethod
    def mel_spectrogram(
        wav: np.ndarray,
        sr: int = 44100,
        n_fft: int = 1024,
        hop_length: int = None,
        n_mels: int = 64,
        top_db: float = 80.0,
    ) -> np.ndarray:
        """Log-mel with torchaudio semantics incl. the 80 dB floor
        (`processing.py:102-120`)."""
        cfg = frontend.FrontendConfig(
            sample_rate=sr, n_fft=n_fft, hop_length=hop_length or n_fft // 2,
            win_length=n_fft, n_mels=n_mels, fmin=0.0, fmax=sr / 2,
            mel_scale="htk", mel_norm=None, top_db=top_db,
        )
        return np.asarray(frontend.logmel(jnp.asarray(np.atleast_2d(wav)), cfg))

    @staticmethod
    def spectro_augment(
        spec: np.ndarray,
        max_mask_pct: float = 0.1,
        n_freq_masks: int = 1,
        n_time_masks: int = 1,
        seed: int = 0,
    ) -> np.ndarray:
        """Time/freq stripe masking (`processing.py:123-150`)."""
        import jax

        x = jnp.asarray(np.atleast_3d(spec))  # [B, T, F]
        t_width = max(1, int(x.shape[1] * max_mask_pct))
        f_width = max(1, int(x.shape[2] * max_mask_pct))
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        x = drop_stripes(k1, x, axis=1, drop_width=t_width, stripes_num=n_time_masks)
        x = drop_stripes(k2, x, axis=2, drop_width=f_width, stripes_num=n_freq_masks)
        return np.asarray(x)

    @staticmethod
    def plot_waveform(wav: np.ndarray, sr: int, ax=None):
        """Waveform plot (`processing.py:153-170`); requires matplotlib."""
        import matplotlib.pyplot as plt

        ax = ax or plt.gca()
        t = np.arange(wav.shape[-1]) / sr
        ax.plot(t, np.atleast_2d(wav)[0])
        ax.set_xlabel("time [s]")
        return ax

    @staticmethod
    def plot_spectrogram(spec: np.ndarray, ax=None):
        import matplotlib.pyplot as plt

        ax = ax or plt.gca()
        ax.imshow(np.atleast_2d(spec).T, origin="lower", aspect="auto")
        return ax
