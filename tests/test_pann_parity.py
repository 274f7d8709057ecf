"""PANN encoder parity vs the actual reference pann_model.py (shimmed
torchlibrosa), weight-for-weight. Short clips keep the 1-core CPU happy."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_residual_tpu.models.pann import PANNConfig, init_pann_params, pann_apply

from . import reference_oracle as oracle


@pytest.mark.parametrize("model_name", ["Cnn6", "Cnn10", "Cnn14"])
def test_pann_parity(model_name, rng):
    cfg = PANNConfig(model_name=model_name, clip_samples=48000, num_classes=23)
    params = jax.tree.map(np.asarray, init_pann_params(jax.random.PRNGKey(1), cfg))
    ref = oracle.build_reference_pann(model_name, class_num=23)
    oracle.load_jax_params_into_reference_pann(ref, params)

    wav = (rng.standard_normal((2, 48000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        if model_name == "Cnn14":
            ref_out = ref({"waveform": torch.from_numpy(wav)}, device="cpu")
        else:
            ref_out = ref(torch.from_numpy(wav))
    with jax.default_matmul_precision("highest"):
        ours = jax.jit(functools.partial(pann_apply, cfg=cfg))(params, jnp.asarray(wav))

    np.testing.assert_allclose(
        np.asarray(ours["embedding"]), ref_out["embedding"].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_output"]), ref_out["clipwise_output"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["fine_grained_embedding"]),
        ref_out["fine_grained_embedding"].numpy(),
        atol=2e-4, rtol=1e-3,
    )
