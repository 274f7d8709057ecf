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

import functools
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

# Single indirection for every device->host pull in this module, so tests can
# assert the large-dim path never hauls the raw [*, D, D] moments over the
# (slow) device->host relay.
_to_host = np.asarray


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


@functools.partial(
    jax.jit, static_argnames=("k", "iters", "oversample", "with_components")
)
def _randomized_topk_eigh(
    n: jnp.ndarray,
    s: jnp.ndarray,
    outer: jnp.ndarray,
    key: jax.Array,
    *,
    k: int,
    iters: int = 6,
    oversample: int = 16,
    with_components: bool = True,
):
    """Randomized top-k eigendecomposition of the moment-implied covariance,
    entirely on device (Halko et al. 2011 subspace iteration).

    The covariance is never materialised as a second [*, D, D] buffer: each
    iteration applies ``cov @ Q = (outer @ Q - n·mean·(meanᵀQ)) / (n-1)``
    directly from the raw moments — batched MXU matmuls. Re-orthonormalisation
    is gram-matrix whitening (``Q ← Q·G^{-1/2}`` with ``G = QᵀQ`` eigh'd at
    [m, m]) rather than Householder QR: TPU QR kernels are notoriously slow,
    whereas whitening is two more MXU matmuls plus a tiny eigh. The final
    Rayleigh–Ritz eigh also runs on the tiny [m, m] projected matrix
    (m = k + oversample).

    Returns ``(eigvals [..., k] desc, components [..., k, D] (or [..., 0, D]
    when with_components=False), mean [..., D], trace [...])`` — the only
    tensors that ever need to cross to the host.
    """
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    n = n.astype(f32)
    outer = outer.astype(f32)
    mean = s.astype(f32) / n[..., None]
    denom = jnp.maximum(n - 1.0, 1.0)
    d = outer.shape[-1]
    m = min(k + oversample, d)
    batch_shape = outer.shape[:-2]

    def cov_mm(q):  # q [..., D, m] -> cov @ q, from raw moments
        oq = jnp.einsum("...de,...em->...dm", outer, q, precision=hi)
        mq = jnp.einsum("...d,...dm->...m", mean, q, precision=hi)
        correction = n[..., None, None] * mean[..., :, None] * mq[..., None, :]
        return (oq - correction) / denom[..., None, None]

    def orthonormalize(q):  # gram whitening; MXU-friendly, no QR kernel
        g = jnp.einsum("...dm,...dl->...ml", q, q, precision=hi)
        w, u = jnp.linalg.eigh(g)  # [.., m] ascending, [.., m, m]
        # clamp near-null directions (columns collapse as iteration converges)
        w = jnp.maximum(w, 1e-6 * w[..., -1:])
        inv_sqrt = jnp.einsum(
            "...ml,...l,...nl->...mn", u, 1.0 / jnp.sqrt(w), u, precision=hi
        )
        return jnp.einsum("...dm,...ml->...dl", q, inv_sqrt, precision=hi)

    q = jax.random.normal(key, (*batch_shape, d, m), f32)
    for _ in range(iters + 1):
        q = orthonormalize(cov_mm(q))
    cq = cov_mm(q)
    b = jnp.einsum("...dm,...dl->...ml", q, cq, precision=hi)
    b = 0.5 * (b + jnp.swapaxes(b, -1, -2))
    w, u = jnp.linalg.eigh(b)  # ascending, eigenvectors in columns
    w = w[..., ::-1][..., :k]
    u = u[..., ::-1][..., :k]
    if with_components:
        comps = jnp.swapaxes(jnp.einsum("...dm,...mk->...dk", q, u, precision=hi), -1, -2)
    else:
        comps = jnp.zeros((*batch_shape, 0, d), f32)
    diag_sum = jnp.diagonal(outer, axis1=-2, axis2=-1).sum(-1)
    trace = (diag_sum - n * jnp.sum(mean * mean, axis=-1)) / denom
    return w, comps, mean, trace


def pca_finalize(
    state: PCAState,
    n_components: int | None = None,
    *,
    method: str = "auto",
    return_components: bool = True,
    iters: int = 6,
    oversample: int = 16,
    seed: int = 0,
) -> dict:
    """Eigendecompose the accumulated covariance -> reference-schema dict.

    Works for batched states too (leading axes broadcast through eigh).
    ``explained_variance`` uses the unbiased (n-1) normaliser like sklearn.

    ``method``:
      * ``"dense"`` — exact full-spectrum eigh of the covariance on the host
        in float64. Right for small D (residual-stream PCA, D <= 768).
      * ``"randomized"`` — relay-aware device path for large D (the per-head
        attention PCA is [60, 4096, 4096] ≈ 4 GB of moments; hauling that to
        the host is minutes over a slow relay). Runs
        :func:`_randomized_topk_eigh` in one jit and transfers only the top-k
        eigenpairs + mean + exact trace. ``n_components`` defaults to
        min(768, D): the reference's sklearn ``IncrementalPCA(None)`` also
        truncates (to the FIRST partial_fit batch's row count — its shipped
        CSVs carry 2048 components for layer-0 heads and 128 elsewhere), and
        the largest intrinsic dim recorded across its five fold CSVs is 513,
        so 768 covers every stored 0.99-threshold crossing with headroom.
        ``explained_variance_ratio`` denominators use the exact trace, so
        ratios/intrinsic-dim/participation-ratio match the dense path
        whenever the cumulative ratio crosses the threshold within k (like
        the reference, an intrinsic dim that would exceed the retained
        spectrum saturates at k+1).
      * ``"auto"`` — randomized iff D >= 1024.

    ``return_components=False`` skips computing/transferring the [k, D]
    eigenvector block (the attention-analysis CSVs only consume the spectrum);
    the result's ``"components"`` is then ``None``.
    """
    d = state.outer.shape[-1]
    if method == "auto":
        method = "randomized" if d >= 1024 else "dense"

    if method == "randomized":
        k = min(n_components or 768, d)
        w, comps, mean, trace = _randomized_topk_eigh(
            state.n,
            state.sum,
            state.outer,
            jax.random.PRNGKey(seed),
            k=k,
            iters=iters,
            oversample=oversample,
            with_components=return_components,
        )
        eigvals = np.maximum(_to_host(w, np.float64), 0.0)
        mean = _to_host(mean, np.float64)
        trace = np.maximum(_to_host(trace, np.float64), 0.0)
        ratio = eigvals / np.where(trace > 0, trace, 1.0)[..., None]
        components = (
            _sign_flip(_to_host(comps, np.float64)) if return_components else None
        )
        return {
            "components": components,
            "mean": mean,
            "explained_variance": eigvals,
            "explained_variance_ratio": ratio,
            "total_variance": trace,
            "n_components": k,
            "input_dim": d,
            "num_samples": _to_host(state.n, np.int64),
        }

    if method != "dense":
        raise ValueError(f"unknown pca_finalize method {method!r}")
    n = _to_host(state.n, np.float64)
    mean = _to_host(state.sum, np.float64) / n[..., None]
    outer = _to_host(state.outer, np.float64)
    cov = (outer - n[..., None, None] * mean[..., :, None] * mean[..., None, :]) / np.maximum(
        n[..., None, None] - 1.0, 1.0
    )
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    eigvals = eigvals[..., ::-1]
    components = np.swapaxes(eigvecs, -1, -2)[..., ::-1, :]  # [..., D, D] rows=components
    components = _sign_flip(components)
    eigvals = np.maximum(eigvals, 0.0)
    total = eigvals.sum(axis=-1)
    ratio = eigvals / np.where(total > 0, total, 1.0)[..., None]
    k = n_components or d
    return {
        "components": components[..., :k, :] if return_components else None,
        "mean": mean,
        "explained_variance": eigvals[..., :k],
        "explained_variance_ratio": ratio[..., :k],
        "total_variance": total,
        "n_components": k,
        "input_dim": d,
        "num_samples": _to_host(state.n, np.int64),
    }


def pca_save(path: str, result: dict) -> None:
    """Pickle in the reference's format (`src/residual.py:153-157`)."""
    with open(path, "wb") as f:
        pickle.dump(result, f)


def pca_load(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
