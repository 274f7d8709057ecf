"""Streaming-PCA correctness vs sklearn, artifact round-trips, analysis metrics."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from audio_residual_tpu.ops import pca as pca_ops
from audio_residual_tpu.residual import analyze
from audio_residual_tpu.residual.module import load_residual_params, residual_apply


def test_pca_matches_sklearn_exact(rng):
    from sklearn.decomposition import PCA

    x = rng.standard_normal((500, 16)).astype(np.float32) @ rng.standard_normal((16, 16)).astype(np.float32)
    state = pca_ops.pca_init(16)
    for chunk in np.split(x, 5):
        state = pca_ops.pca_update(state, jnp.asarray(chunk))
    res = pca_ops.pca_finalize(state)

    sk = PCA().fit(x.astype(np.float64))
    np.testing.assert_allclose(res["mean"], sk.mean_, atol=1e-5)
    np.testing.assert_allclose(res["explained_variance"], sk.explained_variance_, rtol=1e-4)
    np.testing.assert_allclose(
        res["explained_variance_ratio"], sk.explained_variance_ratio_, rtol=1e-4
    )
    # components match up to sign
    dots = np.abs(np.sum(res["components"] * sk.components_, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_pca_close_to_incremental(rng):
    """IncrementalPCA (the reference's estimator) is an approximation of exact
    PCA; leading components should agree closely on well-conditioned data."""
    from sklearn.decomposition import IncrementalPCA

    # anisotropic data with clear spectrum
    scales = np.linspace(5, 0.1, 12)
    x = (rng.standard_normal((2000, 12)) * scales).astype(np.float32)
    state = pca_ops.pca_init(12)
    ipca = IncrementalPCA()
    for chunk in np.split(x, 10):
        state = pca_ops.pca_update(state, jnp.asarray(chunk))
        ipca.partial_fit(chunk)
    res = pca_ops.pca_finalize(state)
    dots = np.abs(np.sum(res["components"][:6] * ipca.components_[:6], axis=1))
    assert dots.min() > 0.99, dots
    np.testing.assert_allclose(
        res["explained_variance"][:6], ipca.explained_variance_[:6], rtol=0.05
    )


def test_batched_pca_matches_loop(rng):
    x = rng.standard_normal((3, 200, 8)).astype(np.float32)
    bstate = pca_ops.batched_pca_init((3,), 8)
    bstate = pca_ops.batched_pca_update(bstate, jnp.asarray(x))
    bres = pca_ops.pca_finalize(bstate)
    for h in range(3):
        s = pca_ops.pca_init(8)
        s = pca_ops.pca_update(s, jnp.asarray(x[h]))
        r = pca_ops.pca_finalize(s)
        np.testing.assert_allclose(bres["explained_variance"][h], r["explained_variance"], rtol=1e-5)
        np.testing.assert_allclose(bres["mean"][h], r["mean"], atol=1e-6)


def test_reads_reference_pca_pickles():
    """Our ResiDual loader + the reference's shipped artifacts interoperate."""
    path = "/root/reference/residual_pca/ESC50/layer_0_evalfold_0"
    p = load_residual_params(path)
    assert p["basis"].shape == (96, 96) and p["mean"].shape == (96,)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 96)).astype(np.float32))
    y = residual_apply(x, p["basis"], p["mean"], p["lam"])
    assert np.isfinite(np.asarray(y)).all()
    # lam = ones: projection+reprojection in a (near-)complete orthonormal
    # basis reconstructs the centered input
    recon = np.asarray(y)
    expect = np.asarray(x) - np.asarray(p["mean"])
    np.testing.assert_allclose(recon, expect, atol=1e-3)


def test_finalize_roundtrip_pickle(tmp_path, rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    s = pca_ops.pca_update(pca_ops.pca_init(8), jnp.asarray(x))
    res = pca_ops.pca_finalize(s)
    p = str(tmp_path / "pca.pkl")
    pca_ops.pca_save(p, res)
    res2 = pca_ops.pca_load(p)
    np.testing.assert_array_equal(res["components"], res2["components"])
    # and it loads as a ResiDual
    rp = load_residual_params(p)
    assert rp["basis"].shape == (8, 8)


def test_metrics_against_reference_csv():
    """intrinsic_dim / participation_ratio formulas reproduce the shipped
    pca_results CSV values from its own explained-variance columns."""
    res = analyze.load_pca_csv_results("/root/reference/pca_results/ESC50-fold0.csv")
    checked = 0
    for (layer, head), r in list(res.items())[:5]:
        ev = np.asarray(r["explained_variance"])
        ratio = np.asarray(r["explained_variance_ratio"])
        if r["intrinsic_dim"] is not None:
            # shipped artifacts were generated with the notebook's 0.90
            # threshold (see analyze.intrinsic_dim docstring)
            assert analyze.intrinsic_dim(ratio, threshold=0.90) == int(r["intrinsic_dim"]), (layer, head)
            checked += 1
        if r["participation_ratio"] is not None:
            np.testing.assert_allclose(
                analyze.participation_ratio(ev), r["participation_ratio"], rtol=1e-6
            )
    assert checked > 0


def test_csv_roundtrip(tmp_path, rng):
    results = {}
    for lh in [(0, 0), (0, 1), (1, 0)]:
        ev = np.sort(rng.random(10))[::-1]
        results[lh] = {
            "explained_variance": ev,
            "explained_variance_ratio": ev / ev.sum(),
        }
    path = analyze.save_pca_results_on_file(str(tmp_path), "TEST", 0, results)
    loaded = analyze.load_pca_csv_results(path)
    assert set(loaded) == set(results)
    np.testing.assert_allclose(
        loaded[(0, 1)]["explained_variance"], results[(0, 1)]["explained_variance"], rtol=1e-12
    )
    assert loaded[(0, 0)]["intrinsic_dim"] is not None


def _large_dim_state(rng, d):
    """A PCAState with a strongly decaying spectrum at D >= 1024 (triggers the
    randomized path under method='auto')."""
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = np.concatenate([np.linspace(50, 1, 64), 0.01 * rng.random(d - 64)])
    cov = (q * lam) @ q.T
    state = pca_ops.PCAState(
        n=jnp.asarray(float(d)),
        sum=jnp.zeros(d),
        outer=jnp.asarray((cov * (d - 1)).astype(np.float32)),
    )
    return state, cov


def test_randomized_topk_eigh_accuracy(rng, monkeypatch):
    """pca_finalize at D >= 1024 dispatches to the on-device randomized
    subspace iteration; the top spectrum matches a dense eigh, ratios use the
    exact trace, and the raw [D, D] moments NEVER cross the device->host
    relay (every host pull is guarded via the module's _to_host hook)."""
    d, k = 1024, 32
    state, cov = _large_dim_state(rng, d)

    max_pulled = {"size": 0}

    def guarded_to_host(a, *args, **kwargs):
        arr = np.asarray(a, *args, **kwargs)
        max_pulled["size"] = max(max_pulled["size"], arr.size)
        if arr.size >= d * d:
            raise AssertionError(
                f"pca_finalize pulled a {arr.shape} array to the host — the "
                "randomized path must never transfer the full moments"
            )
        return arr

    monkeypatch.setattr(pca_ops, "_to_host", guarded_to_host)
    res = pca_ops.pca_finalize(state, n_components=k, return_components=False)
    assert res["components"] is None
    assert 0 < max_pulled["size"] < d * d
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1][:k]
    np.testing.assert_allclose(res["explained_variance"][:k], ref, rtol=0.02)
    # ratio denominator is the exact trace
    np.testing.assert_allclose(res["total_variance"], np.trace(cov), rtol=1e-3)
    np.testing.assert_allclose(
        res["explained_variance_ratio"][:5],
        ref[:5] / np.trace(cov), rtol=0.02,
    )


def test_randomized_components_align_with_dense(rng):
    """When eigenvectors are requested, the randomized path's leading
    components span the same subspace as the exact ones."""
    d, k = 1024, 16
    state, cov = _large_dim_state(rng, d)
    res = pca_ops.pca_finalize(state, n_components=k, method="randomized")
    w, v = np.linalg.eigh(cov)
    top = v[:, ::-1][:, :k]  # exact top eigvecs, columns
    # each randomized component lies (almost) fully inside the exact top-k span
    proj = res["components"] @ top  # [k, k]
    norms = np.linalg.norm(proj, axis=1)
    assert norms.min() > 0.99, norms


def test_randomized_matches_dense_batched(rng):
    """Batched (per-head) randomized finalize == per-head dense finalize on
    the retained spectrum."""
    h, n, d = 3, 400, 1024
    x = (rng.standard_normal((h, n, d)) * np.linspace(3, 0.05, d)).astype(np.float32)
    state = pca_ops.batched_pca_init((h,), d)
    state = pca_ops.batched_pca_update(state, jnp.asarray(x))
    rnd = pca_ops.pca_finalize(state, n_components=8, method="randomized")
    dense = pca_ops.pca_finalize(state, n_components=8, method="dense")
    # this spectrum is nearly flat (worst case for subspace iteration), so the
    # tolerance matches the accuracy test's 2%; batching semantics are the
    # point here
    np.testing.assert_allclose(
        rnd["explained_variance"], dense["explained_variance"], rtol=0.02
    )
    np.testing.assert_allclose(rnd["mean"], dense["mean"], atol=1e-4)
    np.testing.assert_allclose(
        rnd["total_variance"], dense["total_variance"], rtol=1e-3
    )
    # ratios agree even though dense normalises by the full-spectrum sum:
    # both denominators are the exact trace
    np.testing.assert_allclose(
        rnd["explained_variance_ratio"],
        dense["explained_variance_ratio"],
        rtol=0.02,
    )
