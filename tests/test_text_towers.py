"""All four text towers (`model.py:494-527`): bart-vs-HF parity and the
factory's tmodel dispatch. (roberta-vs-HF parity: test_roberta_parity.py;
bert-vs-HF: test_openai_bert.py; transformer tower: test_clip_text.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_residual_tpu.models import bart, clap, convert, factory


@pytest.fixture(scope="module")
def bart_pair():
    from transformers import BartConfig as HFBartConfig
    from transformers import BartModel

    torch = pytest.importorskip("torch")
    hf_cfg = HFBartConfig(
        vocab_size=77,
        d_model=32,
        encoder_layers=2,
        decoder_layers=1,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_position_embeddings=48,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        activation_function="gelu",
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        scale_embedding=False,
    )
    with torch.no_grad():
        hf = BartModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert.convert_bart_state_dict(sd, prefix="")
    cfg = bart.BartConfig(
        vocab_size=77, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_position_embeddings=48, pad_token_id=1,
    )
    return hf, params, cfg, torch


def test_bart_encoder_matches_hf(bart_pair, rng):
    hf, params, cfg, torch = bart_pair
    ids = rng.integers(3, 77, (2, 11))
    ids[1, 7:] = 1  # padding
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf.encoder(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        bart.bart_apply(params, jnp.asarray(ids), jnp.asarray(mask), cfg)[
            "encoder_last_hidden_state"
        ]
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("tmodel", ["roberta", "bert", "transformer", "bart"])
def test_factory_builds_every_text_tower(tmodel, rng):
    """`create_model(amodel, t)` succeeds for all four tmodel choices and
    encode_text produces finite joint-space features (`model.py:602-648`)."""
    params, cfg, model_cfg = factory.create_model("HTSAT-tiny", tmodel)
    assert cfg.text_model_type == tmodel
    ids = jnp.asarray(rng.integers(3, min(cfg.text.vocab_size, 1000), (2, 12)))
    feats = clap.encode_text(params, ids, None, cfg)
    assert feats.shape == (2, cfg.joint_embed_shape)
    assert np.isfinite(np.asarray(feats)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5
    )


def test_factory_unknown_tmodel_raises():
    with pytest.raises(RuntimeError, match="not found"):
        factory.create_model("HTSAT-tiny", "t5")


def test_bart_mean_pooling_is_unmasked(bart_pair, rng):
    """The reference averages encoder states over ALL positions including
    padding (`model.py:637-645` torch.mean without mask) — encode_text must
    reproduce that, so changing pad content changes nothing only if ids equal."""
    hf, params, bcfg, torch = bart_pair
    cfg = clap.CLAPConfig(text=bcfg, text_model_type="bart")
    proj = clap._proj_init(
        jax.random.PRNGKey(0), clap.text_tower_width(cfg),
        cfg.joint_embed_shape, cfg.joint_embed_shape,
    )
    full = {"text_branch": params, "text_projection": proj}
    ids = rng.integers(3, 77, (1, 9))
    ids[0, 5:] = 1
    mask = (ids != 1).astype(np.int32)
    ours = clap.encode_text(full, jnp.asarray(ids), jnp.asarray(mask), cfg, normalize=False)
    hidden = bart.bart_apply(params, jnp.asarray(ids), jnp.asarray(mask), bcfg)[
        "encoder_last_hidden_state"
    ]
    manual = clap.apply_projection(cfg, full["text_projection"], jnp.mean(hidden, axis=1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(manual), atol=1e-6)
