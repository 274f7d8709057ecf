"""Native C data-kernel tests (ctypes layer vs numpy semantics)."""

import numpy as np
import pytest

from audio_residual_tpu import native


def test_builds_and_loads():
    assert native.available(), "gcc build of the native layer failed"


def test_pcm16_decode_matches_numpy(rng):
    x = (rng.standard_normal(3000) * 20000).astype(np.int16)
    stereo = np.stack([x, -x // 2], axis=1).reshape(-1)
    got = native.pcm16_to_float32_mono(stereo.tobytes(), channels=2)
    ref = stereo.reshape(-1, 2).astype(np.float32).mean(1) / 32768.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_quantize_matches_torch_semantics(rng):
    import torch

    x = (rng.standard_normal(5000) * 0.7).astype(np.float32)
    x[:10] = [1.5, -1.5, 0.0, 1.0, -1.0, 0.5, -0.5, 1e-6, -1e-6, 0.99999]
    got = native.quantize_roundtrip(x)
    t = torch.from_numpy(x)
    ref = (torch.clamp(t, -1, 1) * 32767.0).to(torch.int16).to(torch.float32) / 32767.0
    np.testing.assert_array_equal(got, ref.numpy())

    # the JAX path stays f32-only (int16 vector ops are ~38x slower on TPU)
    # but must remain BIT-identical to the int16 round-trip: every
    # post-trunc value is an integer <= 32767, exact in f32
    from audio_residual_tpu.ops import quantize as q

    np.testing.assert_array_equal(np.asarray(q.quantize_roundtrip(x)), ref.numpy())
    np.testing.assert_array_equal(
        np.asarray(q.int16_to_float32(q.float32_to_int16(x))), ref.numpy()
    )


def test_pad_or_truncate(rng):
    x = rng.standard_normal(100).astype(np.float32)
    out = native.pad_or_truncate(x, 150)
    np.testing.assert_array_equal(out[:100], x)
    assert (out[100:] == 0).all()
    out2 = native.pad_or_truncate(x, 60)
    np.testing.assert_array_equal(out2, x[:60])
