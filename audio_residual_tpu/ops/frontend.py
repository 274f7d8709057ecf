"""Audio DSP frontend: STFT -> mel -> log, TPU-native.

Replaces the reference's torchlibrosa frontend
(`CLAP/src/laion_clap/clap_module/htsat.py:681-687`: ``Spectrogram`` +
``LogmelFilterBank``) and the torchaudio ``MelSpectrogram``/``AmplitudeToDB``
fusion-path frontend (`CLAP/src/laion_clap/training/data.py:363-399`).

Design: instead of the reference's conv1d-with-DFT-basis formulation we frame
the waveform with a gather and compute the DFT as two dense matmuls
(cos/sin basis), which maps directly onto the MXU and lets XLA fuse the
windowing multiply into the matmul epilogue. The mel projection is a third
matmul. All basis matrices are built once in numpy at trace time (static
constants baked into the jaxpr).

Semantics matched exactly:
  * hann window, periodic (``fftbins=True``), ``win_length == n_fft``
  * ``center=True`` with reflect padding of ``n_fft // 2`` on both sides
  * power spectrum (``power=2.0``)
  * mel filterbank: either Slaney scale + slaney area-normalisation
    (librosa/torchlibrosa default, used *inside* HTSAT) or HTK scale with no
    normalisation (torchaudio ``norm=None`` default, used by the fusion-path
    ``get_mel``)
  * ``10 * log10(clamp(x, amin))``, ``ref=1.0``, ``amin=1e-10``, no top_db
    clamp for HTSAT (`htsat.py:676-678`); fusion ``get_mel`` also uses
    ``top_db=None``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FrontendConfig",
    "hann_window",
    "mel_frequencies",
    "mel_filterbank",
    "stft_power",
    "power_to_db",
    "logmel",
    "batch_norm_mel",
]


@dataclass(frozen=True)
class FrontendConfig:
    """Static DSP parameters (reference defaults = HTSAT-tiny.json audio_cfg)."""

    sample_rate: int = 48000
    n_fft: int = 1024
    hop_length: int = 480
    win_length: int = 1024
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    ref: float = 1.0
    amin: float = 1e-10
    top_db: float | None = None
    # "slaney" (librosa/torchlibrosa default; HTSAT internal frontend) or
    # "htk" (torchaudio default; fusion-path get_mel).
    mel_scale: str = "slaney"
    mel_norm: str | None = "slaney"

    def num_frames(self, num_samples: int) -> int:
        # center=True pads n_fft//2 on both sides.
        return (num_samples + 2 * (self.n_fft // 2) - self.n_fft) // self.hop_length + 1


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic hann window — matches scipy ``get_window('hann', n, fftbins=True)``."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _hz_to_mel(freq: np.ndarray, scale: str) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        mel = freq / f_sp
        log_region = freq >= min_log_hz
        mel = np.where(
            log_region,
            min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
            mel,
        )
        return mel
    raise ValueError(f"unknown mel scale {scale!r}")


def _mel_to_hz(mel: np.ndarray, scale: str) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        hz = mel * f_sp
        log_region = mel >= min_log_mel
        hz = np.where(log_region, min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)
        return hz
    raise ValueError(f"unknown mel scale {scale!r}")


def mel_frequencies(n_mels: int, fmin: float, fmax: float, scale: str) -> np.ndarray:
    """``n_mels`` band-center frequencies evenly spaced on the mel scale."""
    mels = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels)
    return _mel_to_hz(mels, scale)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """Triangular mel filterbank, shape ``[n_fft // 2 + 1, n_mels]``.

    With ``mel_scale='slaney', mel_norm='slaney'`` this reproduces
    ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax).T`` (torchlibrosa's
    ``LogmelFilterBank.melW``); with ``mel_scale='htk', mel_norm=None`` it
    reproduces torchaudio's default ``MelScale`` basis.
    """
    n_freqs = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_freqs)
    # n_mels + 2 edge frequencies
    pts = mel_frequencies(cfg.n_mels + 2, cfg.fmin, cfg.fmax, cfg.mel_scale)
    fdiff = np.diff(pts)  # [n_mels + 1]
    ramps = pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)  # [n_mels+2, n_freqs]

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_freqs]

    if cfg.mel_norm == "slaney":
        enorm = 2.0 / (pts[2 : cfg.n_mels + 2] - pts[: cfg.n_mels])
        weights = weights * enorm.reshape(-1, 1)
    elif cfg.mel_norm is not None:
        raise ValueError(f"unknown mel norm {cfg.mel_norm!r}")

    return weights.T.astype(np.float32)  # [n_freqs, n_mels]


def mel_active_bins(cfg: FrontendConfig) -> tuple[int, int]:
    """``[lo, hi)`` FFT-bin range with any nonzero mel weight.

    Bins outside ``[fmin, fmax]``'s triangles carry exactly-zero weights
    (`mel_filterbank` maximum(0, ...)), so restricting the DFT + power
    spectrum to this range drops only zero terms from the mel sum — exact up
    to accumulation-order rounding. For HTSAT (fmax 14 kHz @ 48 kHz, n_fft
    1024) this keeps ~300 of 513 bins: a 1.7x FLOP cut in the frontend's
    dominant matmul."""
    nz = np.flatnonzero(mel_filterbank(cfg).any(axis=1))
    return int(nz[0]), int(nz[-1]) + 1


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases ``cos, sin`` of shape ``[n_fft, n_fft//2+1]``.

    ``frames @ cos`` and ``frames @ sin`` give Re/−Im of the rFFT of the
    hann-windowed frame; both matmuls ride the MXU.
    """
    window = hann_window(win_length, dtype=np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    n = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_fft // 2 + 1).reshape(1, -1)
    ang = 2.0 * np.pi * n * k / n_fft
    cos = (np.cos(ang) * window.reshape(-1, 1)).astype(np.float32)
    sin = (np.sin(ang) * window.reshape(-1, 1)).astype(np.float32)
    return cos, sin


def _frame(wav: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Reflect-pad (center) and frame: ``[..., T] -> [..., F, n_fft]``.

    Kept for reference/tests; the production path is the conv formulation in
    :func:`stft_power` (a million-index gather lowers to a scalar loop on
    TPU — measured ~50x slower than the conv).
    """
    pad = n_fft // 2
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    num_frames = (x.shape[-1] - n_fft) // hop + 1
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def _frames_by_slicing(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Overlapping frames via reshape+slice+concat — NO gather, NO conv.

    ``x [B, T_padded] -> [B, frames, n_fft]``. Works because each frame
    ``i`` starts at ``i*hop``: reshape the signal into hop-sized rows, and
    frame ``i`` is the concatenation of rows ``i .. i+ceil(n_fft/hop)-1``
    (last one truncated). Pure layout ops — the TPU-friendly formulation.
    """
    b, t = x.shape
    num_frames = (t - n_fft) // hop + 1
    k = -(-n_fft // hop)  # rows spanned by one frame
    rows_needed = num_frames + k - 1
    total = rows_needed * hop
    if total > t:
        x = jnp.pad(x, ((0, 0), (0, total - t)))
    rows = x[:, : rows_needed * hop].reshape(b, rows_needed, hop)
    parts = []
    used = 0
    for j in range(k):
        width = min(hop, n_fft - used)
        parts.append(rows[:, j : j + num_frames, :width])
        used += width
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def stft_power(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Power spectrogram ``[..., T] -> [..., frames, n_fft//2+1]``.

    Matches torchlibrosa ``Spectrogram(power=2.0, center=True,
    pad_mode='reflect', window='hann')`` (`htsat.py:681-683`).

    TPU formulation: reflect pad -> slice-based overlapping frames (pure
    layout ops; a gather formulation lowers to a scalar loop and a dense
    conv-DFT burns 100x the FLOPs) -> hann window -> real FFT -> |.|².
    """
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    lead = wav.shape[:-1]
    wav = wav.reshape(-1, wav.shape[-1])
    pad = cfg.n_fft // 2
    x = jnp.pad(wav, [(0, 0), (pad, pad)], mode="reflect")
    frames = _frames_by_slicing(x, cfg.n_fft, cfg.hop_length)
    window = jnp.asarray(hann_window(cfg.win_length))
    if cfg.win_length < cfg.n_fft:
        lo = (cfg.n_fft - cfg.win_length) // 2
        window = jnp.pad(window, (lo, cfg.n_fft - cfg.win_length - lo))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    power = power.reshape(*lead, *power.shape[1:])
    return power[0] if squeeze else power


def power_to_db(power: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """``10 log10(clamp(x, amin)) - 10 log10(max(amin, ref))`` (+ optional top_db)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(power, cfg.amin))
    log_spec = log_spec - 10.0 * np.log10(max(cfg.amin, cfg.ref))
    if cfg.top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - cfg.top_db)
    return log_spec


@functools.partial(jax.jit, static_argnames=("cfg",))
def logmel(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Waveform ``[..., T]`` -> log-mel ``[..., frames, n_mels]``."""
    power = stft_power(wav, cfg)
    mel = jnp.matmul(
        power, jnp.asarray(mel_filterbank(cfg)), precision=jax.lax.Precision.HIGHEST
    )
    return power_to_db(mel, cfg)


def batch_norm_mel(
    x: jnp.ndarray,
    params: dict,
    *,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = 0.1,
):
    """The reference's ``bn0`` (`htsat.py:691,900-902`): BatchNorm2d over the
    *mel-bin* axis of a ``[B, frames, n_mels]`` log-mel tensor.

    The torch code transposes to put mel bins in the channel slot; here we
    simply normalise axis ``-1`` per-mel-bin. Returns ``(y, new_state)`` where
    ``new_state`` carries updated running stats when ``train=True`` (else the
    originals).
    """
    scale, bias = params["scale"], params["bias"]
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * params["mean"] + momentum * mean,
            "var": (1 - momentum) * params["var"] + momentum * unbiased,
        }
    else:
        mean, var = params["mean"], params["var"]
        new_state = {"mean": params["mean"], "var": params["var"]}
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y, new_state
