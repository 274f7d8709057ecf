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
