"""Bicubic resize / frame-repeat parity vs torch."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from audio_residual_tpu.ops import interpolate


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((1001, 64), (1024, 64)), ((501, 64), (1024, 64)), ((100, 32), (256, 64)), ((64, 64), (64, 64))],
)
def test_bicubic_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw)).astype(np.float32)
    ours = np.asarray(interpolate.resize_bicubic_align_corners(jnp.asarray(x), *out_hw))
    ref = F.interpolate(
        torch.from_numpy(x)[:, None], size=out_hw, mode="bicubic", align_corners=True
    )[:, 0].numpy()
    # torch computes interpolation weights in f32, ours are f64 — small drift
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_bicubic_dtype_following(rng):
    """bf16 input (the AMP path) stays bf16 through the stretch and lands
    within bf16 rounding of the f32-HIGHEST golden result."""
    x = rng.standard_normal((2, 501, 64)).astype(np.float32)
    gold = np.asarray(interpolate.resize_bicubic_align_corners(jnp.asarray(x), 1024, 64))
    got = interpolate.resize_bicubic_align_corners(
        jnp.asarray(x).astype(jnp.bfloat16), 1024, 64
    )
    assert got.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(got, np.float32) - gold).max() / np.abs(gold).max()
    assert rel < 0.02, rel


def test_patch_embed_gemm_matches_conv(rng):
    """_proj_conv's reshape+GEMM fast path equals the conv it replaces, and
    non-divisible inputs fall back to the remainder-truncating conv."""
    import jax

    from audio_residual_tpu.models import htsat as ht
    from tests.tiny import TINY_AUDIO as cfg

    k = rng.standard_normal(
        (cfg.patch_size, cfg.patch_size, 1, 8)).astype(np.float32)
    p = {"kernel": jnp.asarray(k), "bias": jnp.asarray(np.zeros(8, np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    got = ht._proj_conv(p, x, cfg)
    ref = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=cfg.patch_stride,
        padding=[(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # remainder input: fast path must defer to the conv (floor semantics)
    x2 = jnp.asarray(rng.standard_normal((2, 17, 16, 1)).astype(np.float32))
    got2 = ht._proj_conv(p, x2, cfg)
    assert got2.shape[1] == 17 // cfg.patch_stride[0]


def test_repeat_frames_matches_reference_semantics(rng):
    # reference `interpolate` (clap_module/utils.py:211-224): repeat each frame
    x = rng.standard_normal((2, 10, 5)).astype(np.float32)
    ours = np.asarray(interpolate.repeat_frames(jnp.asarray(x), 4))
    ref = np.repeat(x, 4, axis=1)
    np.testing.assert_array_equal(ours, ref)
