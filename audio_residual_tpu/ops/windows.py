"""Swin-style window ops: partition/reverse, cyclic shift, SW-MSA masks,
relative-position-bias indexing.

Reference semantics: `CLAP/src/laion_clap/clap_module/htsat.py:249-276`
(window_partition/window_reverse), `:414-437` (shifted-window attention mask),
`:301-316` (relative position index).

TPU-first notes: partition/reverse are pure reshapes+transposes (free under
XLA — they become layout changes fused into the surrounding matmuls). The
shifted-window mask and the relative-position index are *static* for a given
resolution, so we build them in numpy once; they enter the jaxpr as
constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_partition",
    "window_reverse",
    "shift_window_mask",
    "relative_position_index",
    "gather_relative_bias",
]


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """``[B, H, W, C] -> [B * nWindows, window*window, C]`` (row-major windows)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // window) * (w // window), window * window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: ``[B*nW, window*window, C] -> [B, H, W, C]``."""
    nw = (h // window) * (w // window)
    b = windows.shape[0] // nw
    c = windows.shape[-1]
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=32)
def shift_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask ``[nWindows, window^2, window^2]`` (0 / -100).

    Built exactly as the reference (`htsat.py:414-433`): label the HxW grid by
    the 3x3 shift regions, partition into windows, and mask pairs from
    different regions with -100.0.
    """
    img = np.zeros((h, w), dtype=np.int32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=8)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """``[wh*ww, wh*ww]`` indices into the ``[(2wh-1)*(2ww-1), nH]`` bias table.

    Mirrors `htsat.py:306-315`.
    """
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # [2, wh, ww]
    flat = coords.reshape(2, -1)  # [2, wh*ww]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [N, N]


def gather_relative_bias(table: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """``table [(2wh-1)*(2ww-1), nH] -> bias [nH, wh*ww, wh*ww]``."""
    idx = jnp.asarray(relative_position_index(wh, ww).reshape(-1))
    n = wh * ww
    # jnp.take (not table[idx]): a numpy-leaf params pytree closed over
    # under jit would otherwise fancy-index numpy-side with a tracer
    bias = jnp.take(jnp.asarray(table), idx, axis=0).reshape(n, n, -1)
    return bias.transpose(2, 0, 1)
