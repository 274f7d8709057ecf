"""OpenAI CLIP text-tower conversion + BERT-style position ids."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from audio_residual_tpu.models import openai as openai_mod
from audio_residual_tpu.models.clip_text import clip_text_apply
from audio_residual_tpu.models import convert, roberta


def _fake_openai_sd(vocab=64, width=64, layers=2, ctx=10, seed=0):
    rng = np.random.default_rng(seed)
    sd = {
        "token_embedding.weight": rng.standard_normal((vocab, width)).astype(np.float32) * 0.02,
        "positional_embedding": rng.standard_normal((ctx, width)).astype(np.float32) * 0.01,
        "ln_final.weight": np.ones(width, np.float32),
        "ln_final.bias": np.zeros(width, np.float32),
    }
    for i in range(layers):
        b = f"transformer.resblocks.{i}."
        sd[b + "ln_1.weight"] = np.ones(width, np.float32)
        sd[b + "ln_1.bias"] = np.zeros(width, np.float32)
        sd[b + "attn.in_proj_weight"] = rng.standard_normal((3 * width, width)).astype(np.float32) * 0.05
        sd[b + "attn.in_proj_bias"] = np.zeros(3 * width, np.float32)
        sd[b + "attn.out_proj.weight"] = rng.standard_normal((width, width)).astype(np.float32) * 0.05
        sd[b + "attn.out_proj.bias"] = np.zeros(width, np.float32)
        sd[b + "ln_2.weight"] = np.ones(width, np.float32)
        sd[b + "ln_2.bias"] = np.zeros(width, np.float32)
        sd[b + "mlp.c_fc.weight"] = rng.standard_normal((4 * width, width)).astype(np.float32) * 0.05
        sd[b + "mlp.c_fc.bias"] = np.zeros(4 * width, np.float32)
        sd[b + "mlp.c_proj.weight"] = rng.standard_normal((width, 4 * width)).astype(np.float32) * 0.05
        sd[b + "mlp.c_proj.bias"] = np.zeros(width, np.float32)
    return sd


def test_openai_conversion_and_forward(rng):
    sd = _fake_openai_sd()
    params, cfg = openai_mod.convert_openai_text_tower(sd)
    assert cfg.width == 64 and cfg.heads == 1 and cfg.layers == 2 and cfg.quick_gelu
    tokens = rng.integers(1, 60, (2, 10)).astype(np.int64)
    tokens[:, -1] = 63
    out = clip_text_apply(jax.tree.map(jnp.asarray, params), jnp.asarray(tokens), cfg)
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_bert_style_matches_hf():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=32, type_vocab_size=2,
        pad_token_id=0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    sd = {"text_branch." + k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert.convert_roberta_state_dict(sd)
    cfg = roberta.RobertaConfig(
        vocab_size=97, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32, type_vocab_size=2,
        pad_token_id=0, style="bert",
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 96, (3, 9)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    with jax.default_matmul_precision("highest"):
        ours = roberta.roberta_apply(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]), ref.pooler_output.numpy(), atol=2e-4, rtol=1e-3
    )
