"""End-to-end tests of the ResiDual trainer, linear probe, losses, and the
zero-shot eval harness on a tiny CLAP (CPU)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.ops import pca as pca_ops
from audio_residual_tpu.residual.module import init_residual_params
from audio_residual_tpu.training import linear_probe, losses, train_residual
from audio_residual_tpu.training.scheduler import cosine_lr

from .tiny import TINY_CLAP, tiny_clap_params

CFG = TINY_CLAP
MAX_LEN = CFG.audio.clip_samples
N_CLASSES = 7


@pytest.fixture(scope="module")
def setup():
    params = tiny_clap_params()
    rng = np.random.default_rng(0)
    text_embeds = rng.standard_normal((N_CLASSES, CFG.joint_embed_shape)).astype(np.float32)
    text_embeds /= np.linalg.norm(text_embeds, axis=-1, keepdims=True)

    def make_batches(seed, n_batches=2, bs=4):
        def gen():
            r = np.random.default_rng(seed)
            for _ in range(n_batches):
                wav = (r.standard_normal((bs, MAX_LEN // 2)) * 0.1).astype(np.float32)
                labels = r.integers(0, N_CLASSES, bs)
                yield wav, labels

        return gen

    return params, jnp.asarray(text_embeds), make_batches


def _residual_for_layer0(params, dim=32):
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    return {0: init_residual_params(q.astype(np.float32), rng.standard_normal(dim).astype(np.float32) * 0.01)}


def test_train_residual_updates_only_lambda(setup):
    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    lam_before = np.asarray(residual[0]["lam"]).copy()
    basis_before = np.asarray(residual[0]["basis"]).copy()
    trained, history = train_residual.train_residual(
        params, CFG, make_batches(1), text_embeds, residual, epochs=2, lr=0.05
    )
    assert len(history) == 2
    assert not np.allclose(np.asarray(trained[0]["lam"]), lam_before)
    np.testing.assert_array_equal(np.asarray(trained[0]["basis"]), basis_before)
    assert np.isfinite(history[-1]["train_loss"])


def test_training_reduces_loss(setup):
    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    # one fixed batch, many steps -> loss must drop
    r = np.random.default_rng(3)
    wav = (r.standard_normal((8, MAX_LEN // 2)) * 0.1).astype(np.float32)
    labels = r.integers(0, N_CLASSES, 8)

    def batches():
        for _ in range(5):
            yield wav, labels

    trained, history = train_residual.train_residual(
        params, CFG, batches, text_embeds, residual, epochs=2, lr=0.1
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]


def test_evaluate_zero_shot_shapes(setup):
    params, text_embeds, make_batches = setup
    preds, targets, sims = train_residual.evaluate_zero_shot(
        params, CFG, make_batches(2)(), text_embeds
    )
    assert preds.shape == targets.shape == (8,)
    assert sims.shape == (8, N_CLASSES)
    assert (preds == sims.argmax(-1)).all()


def test_kfold_harness_artifacts(setup, tmp_path):
    params, text_embeds, make_batches = setup
    # build per-(layer, fold) PCA pickles from random orthonormal bases
    pca_dir = tmp_path / "pca" / "TESTDS"
    pca_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fold in range(2):
        q, _ = np.linalg.qr(rng.standard_normal((32, 32)))
        pca_ops.pca_save(
            str(pca_dir / f"layer_0_evalfold_{fold}"),
            {"components": q, "mean": np.zeros(32)},
        )
    folds = [(make_batches(10 + i), make_batches(20 + i)) for i in range(2)]
    results = train_residual.train_and_evaluate_residual(
        params, CFG, "TESTDS", folds, text_embeds,
        str(tmp_path / "pca"), str(tmp_path / "out"), epochs=1, lr=0.01,
    )
    assert len(results) == 2
    for i in range(2):
        f = np.load(tmp_path / "out" / "TESTDS" / "ResiDual" / f"layers_0_evalfold_{i}.npz")
        assert set(f.files) == {"similarities", "predictions", "targets"}
        assert (tmp_path / "out" / "TESTDS" / "ResiDual" / f"lambda_layer0_evalfold_{i}.pkl").exists()


def test_linear_probe_end_to_end(setup, tmp_path):
    params, _, make_batches = setup
    folds = [(make_batches(1, n_batches=3, bs=8), make_batches(2))]
    results = linear_probe.train_and_eval_linear_head(
        params, CFG, "TESTDS", folds, N_CLASSES, str(tmp_path), epochs=10, lr=1e-2
    )
    assert len(results) == 1
    f = np.load(tmp_path / "TESTDS" / "Linear" / "evalfold_0.npz")
    sims = f["similarities"]
    np.testing.assert_allclose(sims.sum(-1), 1.0, atol=1e-5)  # softmax rows


def test_linear_head_learns_separable_data():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 16)) * 3
    y = rng.integers(0, 3, 300)
    x = (centers[y] + rng.standard_normal((300, 16)) * 0.1).astype(np.float32)
    head, _ = linear_probe.train_linear_head(
        jax.random.PRNGKey(0), x, y, 3, epochs=30, lr=5e-2
    )
    preds, _, _ = linear_probe.eval_linear_head(head, x, y)
    assert (preds == y).mean() > 0.95


def test_clip_loss_single_device(setup):
    params, _, _ = setup
    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 32)).astype(np.float32)
    t = rng.standard_normal((6, 32)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    outputs = {
        "audio_features": jnp.asarray(a),
        "text_features": jnp.asarray(t),
        "audio_features_mlp": jnp.asarray(a * 0.5),
        "text_features_mlp": jnp.asarray(t * 0.5),
        "logit_scale_a": jnp.asarray(10.0),
        "logit_scale_t": jnp.asarray(10.0),
    }
    l2 = losses.clip_loss(outputs)
    l4 = losses.clip_loss(outputs, mlp_loss=True)
    assert np.isfinite(float(l2)) and np.isfinite(float(l4))
    # perfectly-aligned pairs with big scale -> near-zero loss
    outputs2 = dict(outputs, text_features=jnp.asarray(a), logit_scale_a=jnp.asarray(100.0))
    assert float(losses.clip_loss(outputs2)) < 0.01


def test_cosine_lr_schedule():
    sched = cosine_lr(1.0, warmup=10, total_steps=110)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(60)) == pytest.approx(0.5, abs=1e-6)


def test_lp_loss_and_metrics():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((20, 5)).astype(np.float32)
    y = rng.integers(0, 5, 20)
    assert np.isfinite(float(losses.lp_loss(jnp.asarray(logits), jnp.asarray(y), "ce")))
    onehot = np.eye(5)[y].astype(np.float32)
    assert np.isfinite(float(losses.lp_loss(jnp.asarray(logits), jnp.asarray(onehot), "bce")))
    assert np.isfinite(float(losses.lp_loss(jnp.asarray(logits), jnp.asarray(onehot), "mse")))
    m = losses.lp_metrics(jax.nn.softmax(jnp.asarray(logits)), y)
    assert set(m) == {"acc", "map", "mauc"}


def test_cached_prefix_training_matches_full(setup):
    """cache_prefix=True trains identically (eval-mode deterministic fwd)."""
    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    kw = dict(epochs=1, lr=0.05)
    r1, h1 = train_residual.train_residual(
        params, CFG, make_batches(7), text_embeds, residual, **kw
    )
    r2, h2 = train_residual.train_residual(
        params, CFG, make_batches(7), text_embeds, residual, cache_prefix=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(r1[0]["lam"]), np.asarray(r2[0]["lam"]), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(h1[0]["train_loss"], h2[0]["train_loss"], rtol=1e-4)


def test_rand_trunc_crops_vary_across_train_steps(setup):
    """The train step's per-step rng reaches featurization: on a >max_len
    batch, rand_trunc crops (and hence losses) differ between steps, while
    rng=None stays deterministic — the eval behaviour
    (`data.py:465-468` crops fresh per step in the reference loader)."""
    from audio_residual_tpu.data.featurize import featurize_batch

    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    lam, frozen = train_residual._split_residual(residual)
    import optax

    optimizer = optax.adam(0.01)
    _, loss_fn = train_residual.make_zero_shot_step(
        params, CFG, text_embeds, frozen, optimizer, max_len=MAX_LEN
    )
    r = np.random.default_rng(0)
    wav = jnp.asarray((r.standard_normal((2, MAX_LEN * 2)) * 0.1).astype(np.float32))
    labels = jnp.asarray(r.integers(0, N_CLASSES, 2))
    base = jax.random.PRNGKey(0)
    l0, _ = loss_fn(lam, wav, labels, jax.random.fold_in(base, 0))
    l1, _ = loss_fn(lam, wav, labels, jax.random.fold_in(base, 1))
    assert float(l0) != float(l1)  # different steps -> different crops
    l0b, _ = loss_fn(lam, wav, labels, jax.random.fold_in(base, 0))
    assert float(l0) == float(l0b)  # same step rng -> same crop
    ln_a, _ = loss_fn(lam, wav, labels, None)
    ln_b, _ = loss_fn(lam, wav, labels, None)
    assert float(ln_a) == float(ln_b)  # eval: deterministic
    # and at the featurize level: the crops themselves differ
    c0 = featurize_batch(wav, MAX_LEN, rng=jax.random.fold_in(base, 0))["waveform"]
    c1 = featurize_batch(wav, MAX_LEN, rng=jax.random.fold_in(base, 1))["waveform"]
    assert not np.array_equal(np.asarray(c0), np.asarray(c1))


def test_lp_mixup_trains_and_regularises():
    """LP-path mixup (`lp_train.py:86-91`): soft labels via do_mixup, loss
    stays finite, the trained head differs from the no-mixup head, and the
    easy separable problem is still learned."""
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 16)) * 3
    y = rng.integers(0, 3, 300)
    x = (centers[y] + rng.standard_normal((300, 16)) * 0.1).astype(np.float32)
    head_mix, hist_mix = linear_probe.train_linear_head(
        jax.random.PRNGKey(0), x, y, 3, epochs=30, lr=5e-2, mixup_alpha=0.5
    )
    head_plain, _ = linear_probe.train_linear_head(
        jax.random.PRNGKey(0), x, y, 3, epochs=30, lr=5e-2
    )
    assert all(np.isfinite(h["train_loss"]) for h in hist_mix)
    assert not np.allclose(
        np.asarray(head_mix["out"]["kernel"]), np.asarray(head_plain["out"]["kernel"])
    )
    preds, _, _ = linear_probe.eval_linear_head(head_mix, x, y)
    assert (preds == y).mean() > 0.95


def test_visualize_eval_metrics_and_heatmap(tmp_path, rng):
    """`src/evaluation.py:132-198` equivalent: per-fold npz schema, cross-fold
    metrics, and the confusion-heatmap figure file (headless render)."""
    from audio_residual_tpu.evaluate.harness import (
        plot_lambda_histogram,
        visualize_eval_metrics,
    )

    n_classes, n = 7, 40
    for i in range(3):
        sims = rng.standard_normal((n, n_classes)).astype(np.float32)
        targets = rng.integers(0, n_classes, n)
        np.savez(
            tmp_path / f"layers_0_evalfold_{i}.npz",
            similarities=sims,
            predictions=sims.argmax(-1),
            targets=targets,
        )
    fig = str(tmp_path / "cm.png")
    out = visualize_eval_metrics(
        str(tmp_path), "TEST", 3, inject_layers=[0], k_top=5, fig_path=fig
    )
    assert os.path.exists(fig) and os.path.getsize(fig) > 0
    assert out["confusion_matrix"].shape == (n_classes, n_classes)
    assert out["confusion_matrix"].sum() == 3 * n
    assert 0.0 <= out["acc_mean"] <= 1.0 and out["topk_mean"] >= out["acc_mean"]
    # cross-check one fold against sklearn
    from sklearn.metrics import f1_score

    d = np.load(tmp_path / "layers_0_evalfold_0.npz")
    skl_f1 = f1_score(d["targets"], d["predictions"], average="macro", zero_division=0)
    # recompute via the same path
    one = visualize_eval_metrics(str(tmp_path), "TEST", 1, inject_layers=[0])
    np.testing.assert_allclose(one["f1_mean"], skl_f1, rtol=1e-9)

    lam_fig = plot_lambda_histogram(rng.standard_normal(96), str(tmp_path / "lam.png"))
    assert os.path.exists(lam_fig) and os.path.getsize(lam_fig) > 0


def test_auto_cache_prefix_layer1_exact_and_active(setup, monkeypatch):
    """cache_prefix=None auto-caches for min-layer >= 1 injection (VERDICT r4
    item 6: the frozen-prefix cache must sit in the actual hot path) and the
    cached run is numerically identical to the uncached one."""
    params, text_embeds, make_batches = setup
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    residual = {1: init_residual_params(
        q.astype(np.float32), rng.standard_normal(64).astype(np.float32) * 0.01
    )}
    calls = []
    orig = train_residual.cache_prefix_tokens

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(train_residual, "cache_prefix_tokens", spy)
    kw = dict(epochs=2, lr=0.05)
    r_auto, h_auto = train_residual.train_residual(
        params, CFG, make_batches(11), text_embeds, residual, **kw
    )
    # the auto path pre-scans lengths host-side, then caches unconditionally
    assert len(calls) == 1 and "exact_only" not in calls[0]
    r_off, h_off = train_residual.train_residual(
        params, CFG, make_batches(11), text_embeds, residual,
        cache_prefix=False, **kw
    )
    assert len(calls) == 1  # False never caches
    np.testing.assert_allclose(
        np.asarray(r_auto[1]["lam"]), np.asarray(r_off[1]["lam"]),
        atol=1e-5, rtol=1e-4,
    )
    for ha, ho in zip(h_auto, h_off):
        np.testing.assert_allclose(ha["train_loss"], ho["train_loss"], rtol=1e-5)


def test_auto_cache_layer0_uses_image_cache(setup, monkeypatch):
    """Layer-0 injection (the published best config, PDF Table 1) must
    auto-cache at the post-frontend IMAGE boundary, not tokens (layer-0
    tokens are bigger than the waveform; the image is 7.3x smaller at full
    size — VERDICT r4 item 3), and the cached run must match the uncached
    one numerically."""
    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    monkeypatch.setattr(
        train_residual, "cache_prefix_tokens",
        lambda *a, **kw: pytest.fail("layer-0 auto run must not cache tokens"),
    )
    img_calls = []
    orig = train_residual.cache_prefix_images

    def spy(*a, **kw):
        img_calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(train_residual, "cache_prefix_images", spy)
    kw = dict(epochs=2, lr=0.05)
    r_auto, h_auto = train_residual.train_residual(
        params, CFG, make_batches(12), text_embeds, residual, **kw
    )
    assert len(img_calls) == 1
    r_off, h_off = train_residual.train_residual(
        params, CFG, make_batches(12), text_embeds, residual,
        cache_prefix=False, **kw
    )
    assert len(img_calls) == 1  # False never caches
    np.testing.assert_allclose(
        np.asarray(r_auto[0]["lam"]), np.asarray(r_off[0]["lam"]),
        atol=1e-5, rtol=1e-4,
    )
    for ha, ho in zip(h_auto, h_off):
        np.testing.assert_allclose(ha["train_loss"], ho["train_loss"], rtol=1e-5)


def test_auto_cache_skips_device_work_on_late_long_clip(setup, monkeypatch):
    """A >max_len clip in the LAST batch must disable the auto cache without
    any wasted prefix compute: the length pre-scan runs host-side first, so
    cache_prefix_tokens is never called."""
    params, text_embeds, make_batches = setup
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    residual = {1: init_residual_params(
        q.astype(np.float32), rng.standard_normal(64).astype(np.float32) * 0.01
    )}

    def mixed_batches():
        r = np.random.default_rng(7)
        yield (r.standard_normal((2, MAX_LEN)) * 0.1).astype(np.float32), r.integers(0, N_CLASSES, 2)
        yield (r.standard_normal((2, MAX_LEN + 64)) * 0.1).astype(np.float32), r.integers(0, N_CLASSES, 2)

    monkeypatch.setattr(
        train_residual, "cache_prefix_tokens",
        lambda *a, **kw: pytest.fail("pre-scan must bail before any prefix compute"),
    )
    monkeypatch.setattr(
        train_residual, "cache_prefix_images",
        lambda *a, **kw: pytest.fail("pre-scan must bail before any prefix compute"),
    )
    _, hist = train_residual.train_residual(
        params, CFG, mixed_batches, text_embeds, residual, epochs=1, lr=0.05,
        max_len=MAX_LEN,
    )
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])


def test_cache_prefix_exact_only_bails_on_rand_trunc(setup):
    """exact_only=True refuses to cache >max_len clips (rand_trunc crops must
    stay fresh per step, `data.py:465-468`)."""
    params, _, _ = setup

    def long_batches():
        r = np.random.default_rng(5)
        yield (r.standard_normal((2, MAX_LEN + 64)) * 0.1).astype(np.float32), r.integers(0, N_CLASSES, 2)

    assert train_residual.cache_prefix_tokens(
        params, CFG, long_batches(), 1, max_len=MAX_LEN, exact_only=True
    ) is None


def test_train_with_config_layer1_cached_matches_uncached_eval(setup):
    """The sweep runner's auto prefix cache (train AND per-epoch eval side)
    is exact: its reported val accuracy equals a from-scratch full-waveform
    evaluate_zero_shot with the trained residual."""
    params, text_embeds, make_batches = setup
    rng = np.random.default_rng(4)
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    import pickle, tempfile, os

    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "DS"))
        with open(os.path.join(td, "DS", "layer_1_evalfold_0"), "wb") as f:
            pickle.dump({"components": q.astype(np.float32),
                         "mean": rng.standard_normal(64).astype(np.float32) * 0.01,
                         "n_components": 64, "input_dim": 64}, f)
        out = train_residual.train_with_config(
            {"lr": 0.05, "epochs": 2, "inject_layers": (1,), "eval_fold": 0,
             "max_len": MAX_LEN},
            params, CFG, "DS", [(make_batches(21), make_batches(22))],
            text_embeds, td,
        )
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    preds, targets, _ = train_residual.evaluate_zero_shot(
        params, CFG, make_batches(22)(), text_embeds,
        residual=out["residual"], max_len=MAX_LEN,
    )
    assert out["history"][-1]["val_acc"] == float((preds == targets).mean())


def test_train_with_config_layer0_image_cached_matches_uncached_eval(setup):
    """Layer 0 is the sweep grid's winning config (PDF Table 1): the runner
    now image-caches both loop sides there, and the reported val accuracy
    must still equal a from-scratch full-waveform eval."""
    params, text_embeds, make_batches = setup
    rng = np.random.default_rng(6)
    q, _ = np.linalg.qr(rng.standard_normal((32, 32)))
    import pickle, tempfile, os

    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "DS"))
        with open(os.path.join(td, "DS", "layer_0_evalfold_0"), "wb") as f:
            pickle.dump({"components": q.astype(np.float32),
                         "mean": rng.standard_normal(32).astype(np.float32) * 0.01,
                         "n_components": 32, "input_dim": 32}, f)
        out = train_residual.train_with_config(
            {"lr": 0.05, "epochs": 2, "inject_layers": (0,), "eval_fold": 0,
             "max_len": MAX_LEN},
            params, CFG, "DS", [(make_batches(31), make_batches(32))],
            text_embeds, td,
        )
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    preds, targets, _ = train_residual.evaluate_zero_shot(
        params, CFG, make_batches(32)(), text_embeds,
        residual=out["residual"], max_len=MAX_LEN,
    )
    assert out["history"][-1]["val_acc"] == float((preds == targets).mean())


def test_stop_at_image_split_is_exact(setup):
    """Splitting the forward at the post-frontend image boundary
    (``stop_at_image`` -> ``batch={"image": ...}``) reproduces the unsplit
    embedding bit-for-bit on the golden f32 path."""
    params, text_embeds, make_batches = setup
    residual = _residual_for_layer0(params)
    wav, _ = next(make_batches(41)())
    wav = jnp.asarray(wav)
    from audio_residual_tpu.data.featurize import featurize_batch

    batch = featurize_batch(wav, MAX_LEN)
    full = clap_mod.encode_audio(params, batch, CFG, residual=residual)["normalized"]
    img = clap_mod.encode_audio(params, batch, CFG, stop_at_image=True)["image"]
    assert img.ndim == 4 and img.shape[-1] == 1
    split = clap_mod.encode_audio(
        params, {"image": img}, CFG, residual=residual
    )["normalized"]
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))
    # guards: fusion input / image + start_layer are rejected
    with pytest.raises(ValueError):
        clap_mod.encode_audio(params, {"image": img}, CFG, start_layer=1)
