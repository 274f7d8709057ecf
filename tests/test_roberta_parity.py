"""RoBERTa tower parity vs HuggingFace transformers (the reference's text
branch, `model.py:505-514,629-640`). Random weights, small config — exercises
embeddings (incl. RoBERTa's padding-offset position ids), attention masking,
LN placement, gelu, and the tanh pooler.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_residual_tpu.models import convert, roberta


@pytest.fixture(scope="module")
def pair():
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel

    hf_cfg = HFConfig(
        vocab_size=101,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = RobertaModel(hf_cfg).eval()
    sd = {"text_branch." + k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert.convert_roberta_state_dict(sd)
    cfg = roberta.RobertaConfig(
        vocab_size=101, hidden_size=32, num_layers=3, num_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    )
    return hf, params, cfg


def test_pooler_and_hidden_parity(pair):
    hf, params, cfg = pair
    rng = np.random.default_rng(3)
    ids = rng.integers(2, 100, size=(4, 12)).astype(np.int64)
    # right-pad two sequences with pad_token_id=1 + matching attention masks
    mask = np.ones_like(ids)
    ids[1, 8:] = 1
    mask[1, 8:] = 0
    ids[3, 5:] = 1
    mask[3, 5:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    with jax.default_matmul_precision("highest"):
        ours = roberta.roberta_apply(params, jnp.asarray(ids), jnp.asarray(mask), cfg)

    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), ref.last_hidden_state.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]), ref.pooler_output.numpy(), atol=2e-4, rtol=1e-3
    )


def test_bf16_amp_mode_close_to_f32(pair):
    """compute_dtype=bf16 (clap_apply's AMP reaching the text tower) stays
    within bf16-mantissa error of the f32 tower."""
    _, params, cfg = pair
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(2, 100, size=(3, 10)).astype(np.int64))
    f32 = roberta.roberta_apply(params, ids, None, cfg)["pooler_output"]
    b16 = roberta.roberta_apply(params, ids, None, cfg, compute_dtype=jnp.bfloat16)[
        "pooler_output"
    ]
    a, b = np.asarray(f32), np.asarray(b16)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos


def test_position_ids_match_hf(pair):
    from transformers.models.roberta.modeling_roberta import (
        create_position_ids_from_input_ids,
    )

    ids = np.array([[5, 7, 9, 1, 1], [1, 1, 4, 4, 4]], dtype=np.int64)
    ref = create_position_ids_from_input_ids(torch.from_numpy(ids), padding_idx=1).numpy()
    ours = np.asarray(roberta.position_ids_from_input_ids(jnp.asarray(ids), 1))
    np.testing.assert_array_equal(ours, ref)
