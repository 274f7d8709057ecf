"""Window partition/reverse, SW-MSA mask, relative-position index tests."""

import jax.numpy as jnp
import numpy as np
import torch

from audio_residual_tpu.ops import windows


def _torch_window_partition(x, ws):
    # independent formulation of the Swin paper's partitioning
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def test_partition_reverse_roundtrip(rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    wins = windows.window_partition(jnp.asarray(x), 8)
    assert wins.shape == (2 * 4, 64, 3)
    back = windows.window_reverse(wins, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), x)
    ref = _torch_window_partition(torch.from_numpy(x), 8).numpy()
    np.testing.assert_array_equal(np.asarray(wins), ref)


def test_shift_mask_properties():
    m = windows.shift_window_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # first window (interior) is fully unmasked
    assert (m[0] == 0).all()
    # mask is symmetric
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))
    # single-window (8x8 grid) case: the shifted regions wrap fully
    m1 = windows.shift_window_mask(8, 8, 8, 4)
    assert m1.shape == (1, 64, 64)
    assert (m1 != 0).any()


def test_relative_position_index():
    idx = windows.relative_position_index(8, 8)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < 15 * 15
    # diagonal = center of the table
    assert (np.diag(idx) == idx[0, 0]).all()
    # index of relative displacement (0,0) is (7*15 + 7)
    assert idx[0, 0] == 7 * 15 + 7


def test_gather_relative_bias_shape(rng):
    table = jnp.asarray(rng.standard_normal((225, 4)).astype(np.float32))
    bias = windows.gather_relative_bias(table, 8, 8)
    assert bias.shape == (4, 64, 64)
    # symmetric displacements map to transposed positions of each other's index
    idx = windows.relative_position_index(8, 8)
    b = np.asarray(bias)
    t = np.asarray(table)
    np.testing.assert_allclose(b[2], t[idx, 2], atol=0)
