"""End-to-end + per-tap parity of the JAX HTSAT against the REAL reference
implementation (imported from /root/reference with shimmed torchlibrosa).

This is the rebuild's analogue of the reference's missing assertion suite
(SURVEY.md §4): random weights are shared between both frameworks via the
reverse converter, so any mismatch is a semantics bug, not a weights bug.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio_residual_tpu.models.htsat import HTSATConfig, htsat_apply, init_htsat_params

from . import reference_oracle as oracle


@pytest.fixture(scope="module")
def shared():
    cfg = HTSATConfig()
    params = init_htsat_params(jax.random.PRNGKey(42), cfg)
    params = jax.tree.map(lambda x: np.asarray(x), params)
    ref = oracle.build_reference_htsat()
    oracle.load_jax_params_into_reference(ref, params)
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((2, 480000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"waveform": torch.from_numpy(wav)}, device="cpu")
    jit_fwd = jax.jit(
        functools.partial(htsat_apply, cfg=cfg, taps=("attention", "residual"))
    )
    with jax.default_matmul_precision("highest"):
        jax_out = jit_fwd(params, jnp.asarray(wav))
    return ref_out, jax_out


def test_embedding_parity(shared):
    ref_out, jax_out = shared
    a, b = ref_out["embedding"].numpy(), np.asarray(jax_out["embedding"])
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.99999, cos


def test_clipwise_parity(shared):
    ref_out, jax_out = shared
    np.testing.assert_allclose(
        ref_out["clipwise_output"].numpy(), np.asarray(jax_out["clipwise_output"]),
        atol=2e-4,
    )


def test_framewise_and_fine_grained_parity(shared):
    ref_out, jax_out = shared
    np.testing.assert_allclose(
        ref_out["framewise_output"].numpy(), np.asarray(jax_out["framewise_output"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        ref_out["fine_grained_embedding"].numpy(),
        np.asarray(jax_out["fine_grained_embedding"]),
        atol=5e-3, rtol=1e-3,
    )


def test_attention_tap_parity(shared):
    """Per-layer eval-time block-averaged attention maps (`htsat.py:589-595`)."""
    ref_out, jax_out = shared
    for layer in range(4):
        a = ref_out["layers_attention"][layer].numpy()
        b = np.asarray(jax_out["layers_attention"][layer])
        assert a.shape == b.shape, (layer, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"layer {layer}")


def test_residual_tap_parity(shared):
    """Per-layer block-concatenated post-attention residuals (`htsat.py:596`)."""
    ref_out, jax_out = shared
    for layer in range(4):
        a = ref_out["layers_residuals"][layer].numpy()
        b = np.asarray(jax_out["layers_residuals"][layer])
        assert a.shape == b.shape, (layer, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-2, err_msg=f"layer {layer}")
