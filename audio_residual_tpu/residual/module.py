"""ResiDual: learnable anisotropic rescaling in a fixed PCA basis.

Reference: ``ResiDual`` (`src/residual.py:14-42`), from arXiv:2411.00246.
``x_out = ((x - mean) @ basis.T * lam) @ basis`` with ``basis [K, D]`` and
``mean [D]`` frozen PCA statistics and ``lam [K]`` the only trainable
parameter (init ones).

TPU-native design: instead of a module patched into the block's forward, this
is a pure epilogue function folded into the attention-output path by
``htsat_apply(..., residual={layer: params})``. The two [*, D] x [D, K]
matmuls ride the MXU and XLA fuses the centering/scaling elementwise ops into
them. Note the projection-reprojection is invariant to per-component sign
flips of the basis, so PCA eigenvector sign conventions don't matter.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_residual_params",
    "residual_apply",
    "load_residual_params",
    "save_residual_params",
]


def init_residual_params(basis, mean, n_components: int | None = None) -> dict:
    """Build ResiDual params from a PCA ``basis [D, D]`` / ``mean [D]``.

    Keeps the leading ``n_components`` rows (default all), mirroring
    `src/residual.py:20-27`. ``lam`` initialises to ones.
    """
    basis = jnp.asarray(basis, dtype=jnp.float32)
    mean = jnp.asarray(mean, dtype=jnp.float32)
    k = n_components or basis.shape[0]
    return {"basis": basis[:k], "mean": mean, "lam": jnp.ones((k,), jnp.float32)}


def residual_apply(x: jnp.ndarray, basis: jnp.ndarray, mean: jnp.ndarray, lam: jnp.ndarray):
    """``[..., D] -> [..., D]``: center, project to PCA coords, scale, reproject.

    Full-precision matmuls: the projections are tiny ([*, D] x [D, K], D<=768)
    but sit on the residual stream, where reduced-precision MXU passes would
    perturb every downstream layer (measured ~2e-3 embedding drift on TPU
    with the default bf16 passes).
    """
    hi = jax.lax.Precision.HIGHEST
    proj = jnp.matmul(x - mean, basis.T.astype(x.dtype), precision=hi)
    return jnp.matmul(proj * lam.astype(x.dtype), basis.astype(x.dtype), precision=hi)


def load_residual_params(pca_path: str, n_components: int | None = None) -> dict:
    """Load ResiDual params from a reference-format PCA pickle
    (`src/residual.py:161-174`; schema written by `compute_pca_components`
    `src/residual.py:143-151`). Byte-compatible with the shipped
    ``residual_pca/ESC50/layer_*_evalfold_*`` artifacts."""
    with open(pca_path, "rb") as f:
        pca = pickle.load(f)
    return init_residual_params(
        np.asarray(pca["components"]), np.asarray(pca["mean"]), n_components
    )


def save_residual_params(path: str, params: dict, extra: dict | None = None) -> None:
    """Persist a trained ResiDual (basis/mean/lam). The reference never saved
    the trained ``lam`` (only wandb histograms, `src/training.py:128-135`) —
    this fixes that gap while staying pickle-based for interop."""
    blob = {
        "components": np.asarray(params["basis"]),
        "mean": np.asarray(params["mean"]),
        "lam": np.asarray(params["lam"]),
    }
    if extra:
        blob.update(extra)
    with open(path, "wb") as f:
        pickle.dump(blob, f)
