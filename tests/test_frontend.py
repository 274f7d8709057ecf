"""Golden tests for the DSP frontend.

Oracles:
  * torch.stft (same semantics as torchlibrosa's conv1d-DFT Spectrogram:
    hann periodic window, center=True, reflect pad, power=2)
  * transformers.audio_utils.mel_filter_bank (librosa-parity slaney/htk
    filterbanks — independent of our implementation)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_residual_tpu.ops import frontend

CFG = frontend.FrontendConfig()


def _torch_stft_power(wav: np.ndarray, cfg: frontend.FrontendConfig) -> np.ndarray:
    x = torch.from_numpy(wav)
    win = torch.hann_window(cfg.win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        x.double(),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    return (spec.abs() ** 2).transpose(-1, -2).numpy()  # [..., frames, bins]


def test_hann_window_matches_torch():
    ours = frontend.hann_window(1024)
    ref = torch.hann_window(1024, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("t", [48000, 47999, 12345])
def test_stft_power_matches_torch(rng, t):
    wav = rng.standard_normal((2, t)).astype(np.float32) * 0.1
    ours = np.asarray(frontend.stft_power(jnp.asarray(wav), CFG))
    ref = _torch_stft_power(wav, CFG)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_num_frames():
    assert CFG.num_frames(480000) == 1001
    assert frontend.stft_power(jnp.zeros((1, 480000)), CFG).shape == (1, 1001, 513)


@pytest.mark.parametrize(
    "scale,norm",
    [("slaney", "slaney"), ("htk", None)],
)
def test_mel_filterbank_matches_hf(scale, norm):
    from transformers.audio_utils import mel_filter_bank

    cfg = frontend.FrontendConfig(mel_scale=scale, mel_norm=norm)
    ours = frontend.mel_filterbank(cfg)  # [n_freqs, n_mels]
    ref = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=64,
        min_frequency=50.0,
        max_frequency=14000.0,
        sampling_rate=48000,
        norm=norm,
        mel_scale=scale,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_power_to_db_semantics():
    x = jnp.asarray([1e-20, 1e-10, 1.0, 100.0])
    db = frontend.power_to_db(x, CFG)
    # amin clamp at 1e-10 -> -100 dB floor; ref=1.0 -> 0 offset; no top_db
    np.testing.assert_allclose(np.asarray(db), [-100.0, -100.0, 0.0, 20.0], atol=3e-4)


def test_logmel_shape_and_finite(rng):
    wav = rng.standard_normal((1, 48000)).astype(np.float32) * 0.05
    lm = np.asarray(frontend.logmel(jnp.asarray(wav), CFG))
    assert lm.shape == (1, CFG.num_frames(48000), 64)
    assert np.isfinite(lm).all()


def test_batch_norm_mel_eval_matches_torch(rng):
    x = rng.standard_normal((2, 101, 64)).astype(np.float32)
    params = {
        "scale": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        "mean": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        "var": jnp.asarray(rng.random(64).astype(np.float32) + 0.5),
    }
    ours, _ = frontend.batch_norm_mel(jnp.asarray(x), params, train=False)
    bn = torch.nn.BatchNorm2d(64)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(params["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(params["var"])))
    bn.eval()
    # reference layout: [B, T, F] -> transpose so F is the channel dim (htsat.py:900-902)
    xt = torch.from_numpy(x)[:, None].transpose(1, 3)  # [B, F, T, 1]
    with torch.no_grad():
        ref = bn(xt).transpose(1, 3)[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
