"""Full-CLAP oracle parity: the REAL reference CLAP (`model.py:650-693`) vs
our `clap_apply`, with shared random weights via the reverse converter —
covering the projection/transform/logit-scale plumbing end-to-end, plus the
2- and 4-term ClipLoss values (`loss.py:131-221`).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_residual_tpu.models.clap import CLAPConfig, clap_apply, init_clap_params
from audio_residual_tpu.training.losses import clip_loss

from . import reference_oracle as oracle


@pytest.fixture(scope="module")
def shared():
    cfg = CLAPConfig()
    params = init_clap_params(jax.random.PRNGKey(3), cfg)
    params = jax.tree.map(np.asarray, params)

    ref = oracle.build_reference_clap("roberta")
    oracle.load_jax_params_into_reference_clap(ref, params)

    rng = np.random.default_rng(11)
    wav = (rng.standard_normal((2, 480000)) * 0.1).astype(np.float32)
    ids = rng.integers(3, 50000, (2, 12))
    ids[:, 0] = 0  # <s>
    ids[1, 9:] = 1  # padding
    mask = (ids != 1).astype(np.int64)
    mask[:, 0] = 1

    with torch.no_grad():
        ref_out = ref(
            {"waveform": torch.from_numpy(wav)},
            {"input_ids": torch.tensor(ids), "attention_mask": torch.tensor(mask)},
            device="cpu",
        )

    fwd = jax.jit(functools.partial(clap_apply, cfg=cfg))
    with jax.default_matmul_precision("highest"):
        ours = fwd(params, jnp.asarray(wav), jnp.asarray(ids), jnp.asarray(mask))
    ours = jax.tree.map(np.asarray, ours)
    names = (
        "audio_features", "text_features", "audio_features_mlp",
        "text_features_mlp", "logit_scale_a", "logit_scale_t",
    )
    ref_out = {k: v.numpy() for k, v in zip(names, ref_out)}
    return ref_out, ours


def test_audio_text_feature_parity(shared):
    ref_out, ours = shared
    np.testing.assert_allclose(
        ours["audio_features"], ref_out["audio_features"], atol=5e-4
    )
    np.testing.assert_allclose(
        ours["text_features"], ref_out["text_features"], atol=5e-5
    )


def test_mlp_feature_and_scale_parity(shared):
    ref_out, ours = shared
    np.testing.assert_allclose(
        ours["audio_features_mlp"], ref_out["audio_features_mlp"], atol=5e-4
    )
    np.testing.assert_allclose(
        ours["text_features_mlp"], ref_out["text_features_mlp"], atol=5e-5
    )
    np.testing.assert_allclose(ours["logit_scale_a"], ref_out["logit_scale_a"], rtol=1e-6)
    np.testing.assert_allclose(ours["logit_scale_t"], ref_out["logit_scale_t"], rtol=1e-6)


@pytest.mark.parametrize("mlp_loss", [False, True])
def test_clip_loss_value_parity(shared, mlp_loss):
    """Our clip_loss on OUR outputs == the reference ClipLoss on the REFERENCE
    outputs (2-term `loss.py:176-197` and 4-term `loss.py:122-175`)."""
    ref_out, ours = shared
    pkg = oracle._load_ref_package()
    ref_loss_fn = pkg.loss.ClipLoss(mlp_loss=mlp_loss)
    with torch.no_grad():
        ref_loss = ref_loss_fn(
            torch.from_numpy(ref_out["audio_features"]),
            torch.from_numpy(ref_out["text_features"]),
            torch.from_numpy(ref_out["logit_scale_a"]),
            torch.from_numpy(ref_out["logit_scale_t"]),
            torch.from_numpy(ref_out["audio_features_mlp"]),
            torch.from_numpy(ref_out["text_features_mlp"]),
        ).item()
    our_loss = float(clip_loss(jax.tree.map(jnp.asarray, ours), mlp_loss=mlp_loss))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-3, atol=1e-4)


def _synthetic_features(n=8, d=16, seed=5):
    rng = np.random.default_rng(seed)
    feats = {}
    for k in ("audio_features", "text_features", "audio_features_mlp",
              "text_features_mlp"):
        f = rng.standard_normal((n, d)).astype(np.float32)
        feats[k] = f / np.linalg.norm(f, axis=-1, keepdims=True)
    return feats


def _outputs_from(feats, sa, st):
    outputs = {k: jnp.asarray(v) for k, v in feats.items()}
    outputs["logit_scale_a"] = jnp.asarray(np.float32(sa))
    outputs["logit_scale_t"] = jnp.asarray(np.float32(st))
    return outputs


def _ref_loss(pkg, feats, sa, st, **kw):
    fn = pkg.loss.ClipLoss(**kw)
    with torch.no_grad():
        return fn(
            torch.from_numpy(feats["audio_features"]),
            torch.from_numpy(feats["text_features"]),
            torch.tensor(np.float32(sa)),
            torch.tensor(np.float32(st)),
            torch.from_numpy(feats["audio_features_mlp"]),
            torch.from_numpy(feats["text_features_mlp"]),
        ).item()


def test_clip_loss_4term_unequal_scales_oracle():
    """4-term loss with sa != st: the transposed terms must keep their
    partner's scale (`loss.py:138-146`). The model-forward parity fixture
    can't see this — both scales init to ln(1/0.07)."""
    pkg = oracle._load_ref_package()
    feats = _synthetic_features()
    ref = _ref_loss(pkg, feats, 12.0, 9.0, mlp_loss=True)
    ours = float(clip_loss(_outputs_from(feats, 12.0, 9.0), mlp_loss=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kappa", [0.5, 2.0])
def test_weighted_clip_loss_4term_oracle(kappa):
    """Weighted 4-term loss (`--kappa`, `loss.py:104-115,166-177`)
    head-to-head: torch class-weight CE normalisation and the
    same-modality weight pairing must match the reference module."""
    pkg = oracle._load_ref_package()
    feats = _synthetic_features()
    ref = _ref_loss(pkg, feats, 12.0, 9.0, mlp_loss=True, weight_loss_kappa=kappa)
    ours = float(clip_loss(_outputs_from(feats, 12.0, 9.0), mlp_loss=True,
                           weight_loss_kappa=kappa))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kappa", [0.5, 2.0])
def test_weighted_clip_loss_2term(kappa):
    """The reference's weighted 2-term loss CRASHES single-process
    (`loss.py:213`: `all_audio_features` only exists in the world_size>1
    branch — an UnboundLocalError, a genuine reference bug). Document the
    crash, then oracle OUR semantics against a hand-built torch computation
    of what its multi-rank branch defines: weights from the gathered
    features, CROSS-assigned (audio logits weighted by text weights,
    `loss.py:213-220`), torch class-weight CE normalisation."""
    import torch.nn.functional as F

    pkg = oracle._load_ref_package()
    feats = _synthetic_features()
    with pytest.raises(UnboundLocalError):
        _ref_loss(pkg, feats, 12.0, 9.0, mlp_loss=False, weight_loss_kappa=kappa)

    a = torch.from_numpy(feats["audio_features"])
    t = torch.from_numpy(feats["text_features"])
    n = a.shape[0]
    logits_a = 12.0 * a @ t.T
    labels = torch.arange(n)
    aw = torch.exp(torch.sum(a @ a.T, axis=1) / (kappa * n))
    tw = torch.exp(torch.sum(t @ t.T, axis=1) / (kappa * n))
    expected = 0.5 * (
        F.cross_entropy(logits_a, labels, weight=tw)
        + F.cross_entropy(logits_a.T, labels, weight=aw)
    ).item()

    ours = float(clip_loss(_outputs_from(feats, 12.0, 9.0), mlp_loss=False,
                           weight_loss_kappa=kappa))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)
