"""Device-side streaming PCA.

Replaces the reference's host-side ``sklearn.decomposition.IncrementalPCA``
loops (`src/residual.py:103-159` residual-stream PCA; `src/analyze_attention.py
:13-59` per-head attention PCA, SURVEY.md §3.2/§3.3 hot paths).

TPU-first design: instead of streaming SVD on the host, we accumulate exact
second moments ``(n, Σx, Σxxᵀ)`` *inside the forward jit* — one rank-k update
matmul per batch riding the MXU — and eigendecompose the covariance once at
the end. This computes the *exact* batch PCA, whereas IncrementalPCA is an
approximation; components agree up to eigenvector sign and the usual
approximation error of the incremental algorithm (see tests).

The finalized result dict is schema-compatible with the reference's PCA
pickles (``residual_pca/*``: components/mean/explained_variance/
explained_variance_ratio/n_components/input_dim/num_samples —
`src/residual.py:143-151`), so artifacts interoperate both ways.

Batched variants (vmap over heads/layers) cover the per-(layer, head)
attention analysis in one device program.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PCAState",
    "pca_init",
    "pca_update",
    "pca_finalize",
    "pca_save",
    "pca_load",
    "batched_pca_init",
    "batched_pca_update",
]


class PCAState(NamedTuple):
    """Sufficient statistics for exact PCA; a pytree, carryable through jit.

    Leading batch axes are allowed (e.g. per-head): ``sum [..., D]``,
    ``outer [..., D, D]``, ``n [...]``.
    """

    n: jnp.ndarray
    sum: jnp.ndarray
    outer: jnp.ndarray


def pca_init(dim: int, dtype=jnp.float32) -> PCAState:
    return PCAState(
        n=jnp.zeros((), dtype),
        sum=jnp.zeros((dim,), dtype),
        outer=jnp.zeros((dim, dim), dtype),
    )


@jax.jit
def pca_update(state: PCAState, x: jnp.ndarray) -> PCAState:
    """Accumulate a batch ``x [N, D]``. One MXU matmul (``xᵀx``)."""
    x = x.reshape(-1, x.shape[-1]).astype(state.outer.dtype)
    return PCAState(
        n=state.n + x.shape[0],
        sum=state.sum + jnp.sum(x, axis=0),
        outer=state.outer
        + jnp.matmul(x.T, x, precision=jax.lax.Precision.HIGHEST),
    )


def batched_pca_init(batch_shape: tuple[int, ...], dim: int, dtype=jnp.float32) -> PCAState:
    return PCAState(
        n=jnp.zeros(batch_shape, dtype),
        sum=jnp.zeros((*batch_shape, dim), dtype),
        outer=jnp.zeros((*batch_shape, dim, dim), dtype),
    )


@jax.jit
def batched_pca_update(state: PCAState, x: jnp.ndarray) -> PCAState:
    """``x [..., N, D]`` with leading axes matching the state's batch shape."""
    x = x.astype(state.outer.dtype)
    return PCAState(
        n=state.n + x.shape[-2],
        sum=state.sum + jnp.sum(x, axis=-2),
        outer=state.outer
        + jnp.einsum("...nd,...ne->...de", x, x, precision=jax.lax.Precision.HIGHEST),
    )


def _sign_flip(components: np.ndarray) -> np.ndarray:
    """Deterministic sign convention: the max-|.| element of each component
    is positive (sklearn's svd_flip convention on the V side)."""
    idx = np.argmax(np.abs(components), axis=-1, keepdims=True)
    signs = np.sign(np.take_along_axis(components, idx, axis=-1))
    signs = np.where(signs == 0, 1.0, signs)
    return components * signs


def pca_finalize(state: PCAState, n_components: int | None = None) -> dict:
    """Eigendecompose the accumulated covariance -> reference-schema dict.

    Works for batched states too (leading axes broadcast through eigh).
    ``explained_variance`` uses the unbiased (n-1) normaliser like sklearn.
    """
    n = np.asarray(state.n, np.float64)
    mean = np.asarray(state.sum, np.float64) / n[..., None]
    outer = np.asarray(state.outer, np.float64)
    cov = (outer - n[..., None, None] * mean[..., :, None] * mean[..., None, :]) / np.maximum(
        n[..., None, None] - 1.0, 1.0
    )
    if cov.shape[-1] >= 1024:
        # device-side eigh: the per-head attention PCA is [heads, 4096, 4096];
        # a 1-core host would grind for minutes per head
        ev, evec = jnp.linalg.eigh(jnp.asarray(cov, jnp.float32))
        eigvals, eigvecs = np.asarray(ev, np.float64), np.asarray(evec, np.float64)
    else:
        eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    eigvals = eigvals[..., ::-1]
    components = np.swapaxes(eigvecs, -1, -2)[..., ::-1, :]  # [..., D, D] rows=components
    components = _sign_flip(components)
    eigvals = np.maximum(eigvals, 0.0)
    total = eigvals.sum(axis=-1, keepdims=True)
    ratio = eigvals / np.where(total > 0, total, 1.0)
    d = components.shape[-1]
    k = n_components or d
    return {
        "components": components[..., :k, :],
        "mean": mean,
        "explained_variance": eigvals[..., :k],
        "explained_variance_ratio": ratio[..., :k],
        "n_components": k,
        "input_dim": d,
        "num_samples": np.asarray(state.n, np.int64),
    }


def pca_save(path: str, result: dict) -> None:
    """Pickle in the reference's format (`src/residual.py:153-157`)."""
    with open(path, "wb") as f:
        pickle.dump(result, f)


def pca_load(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
