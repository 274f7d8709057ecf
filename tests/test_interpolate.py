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


def test_repeat_frames_matches_reference_semantics(rng):
    # reference `interpolate` (clap_module/utils.py:211-224): repeat each frame
    x = rng.standard_normal((2, 10, 5)).astype(np.float32)
    ours = np.asarray(interpolate.repeat_frames(jnp.asarray(x), 4))
    ref = np.repeat(x, 4, axis=1)
    np.testing.assert_array_equal(ours, ref)
