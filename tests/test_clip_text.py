"""CLIP text tower parity vs a torch reimplementation using
nn.MultiheadAttention (the reference's building block, `model.py:251-339`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from audio_residual_tpu.models.clip_text import (
    ClipTextConfig,
    clip_text_apply,
    init_clip_text_params,
)


def _torch_forward(params, tokens, cfg):
    """Reference-semantics torch forward consuming our param pytree."""
    x = torch.from_numpy(np.asarray(params["token_embedding"]))[torch.from_numpy(tokens)]
    x = x + torch.from_numpy(np.asarray(params["positional_embedding"]))[: tokens.shape[1]]
    l = tokens.shape[1]
    mask = torch.full((l, l), float("-inf")).triu_(1)
    for blk in params["blocks"]:
        attn = nn.MultiheadAttention(cfg.width, cfg.heads, batch_first=False)
        with torch.no_grad():
            attn.in_proj_weight.copy_(torch.from_numpy(np.asarray(blk["attn"]["in_proj"]["kernel"])).T)
            attn.in_proj_bias.copy_(torch.from_numpy(np.asarray(blk["attn"]["in_proj"]["bias"])))
            attn.out_proj.weight.copy_(torch.from_numpy(np.asarray(blk["attn"]["out_proj"]["kernel"])).T)
            attn.out_proj.bias.copy_(torch.from_numpy(np.asarray(blk["attn"]["out_proj"]["bias"])))

        def ln(p, t):
            return torch.nn.functional.layer_norm(
                t, (cfg.width,),
                torch.from_numpy(np.asarray(p["scale"])), torch.from_numpy(np.asarray(p["bias"])),
            )

        with torch.no_grad():
            y = ln(blk["ln1"], x).permute(1, 0, 2)  # LND
            a, _ = attn(y, y, y, need_weights=False, attn_mask=mask)
            x = x + a.permute(1, 0, 2)
            h = ln(blk["ln2"], x)
            h = h @ torch.from_numpy(np.asarray(blk["mlp"]["c_fc"]["kernel"])) + torch.from_numpy(np.asarray(blk["mlp"]["c_fc"]["bias"]))
            h = torch.nn.functional.gelu(h)
            h = h @ torch.from_numpy(np.asarray(blk["mlp"]["c_proj"]["kernel"])) + torch.from_numpy(np.asarray(blk["mlp"]["c_proj"]["bias"]))
            x = x + h
    x = torch.nn.functional.layer_norm(
        x, (cfg.width,),
        torch.from_numpy(np.asarray(params["ln_final"]["scale"])),
        torch.from_numpy(np.asarray(params["ln_final"]["bias"])),
    )
    eot = tokens.argmax(-1)
    return x[np.arange(tokens.shape[0]), eot].numpy()


def test_clip_text_parity(rng):
    cfg = ClipTextConfig(vocab_size=200, width=32, heads=4, layers=2, context_length=12)
    params = jax.tree.map(np.asarray, init_clip_text_params(jax.random.PRNGKey(0), cfg))
    tokens = rng.integers(1, 180, (3, 12)).astype(np.int64)
    tokens[:, -1] = 199  # EOT = highest id
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(clip_text_apply(params, jnp.asarray(tokens), cfg))
    ref = _torch_forward(params, tokens, cfg)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_eot_pooling_position():
    cfg = ClipTextConfig(vocab_size=50, width=16, heads=2, layers=1, context_length=8)
    params = init_clip_text_params(jax.random.PRNGKey(1), cfg)
    t1 = np.array([[5, 49, 0, 0, 0, 0, 0, 0]], np.int64)  # EOT at pos 1
    t2 = np.array([[5, 49, 7, 7, 7, 7, 7, 7]], np.int64)  # same EOT pos, suffix differs
    o1 = np.asarray(clip_text_apply(params, jnp.asarray(t1), cfg))
    o2 = np.asarray(clip_text_apply(params, jnp.asarray(t2), cfg))
    # causal mask: tokens after EOT cannot change the EOT feature
    np.testing.assert_allclose(o1, o2, atol=1e-5)
