"""Tiny model configs for fast CPU tests (1-core box)."""

import jax

from audio_residual_tpu.models.clap import CLAPConfig, init_clap_params
from audio_residual_tpu.models.htsat import HTSATConfig
from audio_residual_tpu.models.roberta import RobertaConfig

TINY_AUDIO = HTSATConfig(
    spec_size=64,
    mel_bins=16,
    embed_dim=32,
    depths=(1, 1),
    num_heads=(2, 4),
    clip_samples=24000,
    num_classes=17,
)

TINY_TEXT = RobertaConfig(
    vocab_size=101,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=40,
)

TINY_CLAP = CLAPConfig(
    embed_dim=64,  # tiny audio num_features = 32 * 2^(2-1)
    joint_embed_shape=32,
    audio=TINY_AUDIO,
    text=TINY_TEXT,
)


def tiny_clap_params(seed: int = 0):
    return init_clap_params(jax.random.PRNGKey(seed), TINY_CLAP)
