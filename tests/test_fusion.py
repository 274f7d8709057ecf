"""Fusion-model tests: DAF/AFF/iAFF ops and the HTSAT fusion forward paths."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_residual_tpu.models.htsat import HTSATConfig, htsat_apply, init_htsat_params
from audio_residual_tpu.ops import fusion as fusion_ops

TINY = dict(spec_size=64, mel_bins=16, embed_dim=32, depths=(1, 1), num_heads=(2, 4),
            clip_samples=24000, num_classes=17)


def _mel_batch(rng, b=2, t=51, f=16):
    mel = rng.standard_normal((b, 4, t, f)).astype(np.float32)
    longer = np.array([True, False][:b] * (b // 2 + 1))[:b]
    return {"mel_fusion": jnp.asarray(mel), "longer": jnp.asarray(longer)}


def test_daf_is_add(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fusion_ops.daf(x, y)), np.asarray(x + y))


@pytest.mark.parametrize("kind,shape", [("1D", (2, 10, 8)), ("2D", (2, 6, 6, 8))])
def test_aff_iaff_shapes(rng, kind, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    pa = fusion_ops.init_aff_params(jax.random.PRNGKey(0), 8, kind=kind)
    pi = fusion_ops.init_iaff_params(jax.random.PRNGKey(1), 8, kind=kind)
    for out in (fusion_ops.aff(pa, x, y, kind=kind), fusion_ops.iaff(pi, x, y, kind=kind)):
        assert out.shape == shape
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("fusion_type", ["daf_1d", "aff_1d", "iaff_1d", "daf_2d", "aff_2d", "iaff_2d", "channel_map"])
def test_htsat_fusion_forward(rng, fusion_type):
    cfg = HTSATConfig(**TINY, enable_fusion=True, fusion_type=fusion_type)
    params = init_htsat_params(jax.random.PRNGKey(0), cfg)
    batch = _mel_batch(rng)
    out = jax.jit(functools.partial(htsat_apply, cfg=cfg))(params, batch)
    assert out["embedding"].shape == (2, 64)
    assert out["clipwise_output"].shape == (2, 17)
    assert np.isfinite(np.asarray(out["embedding"])).all()


@pytest.mark.parametrize("fusion_type", ["aff_1d", "iaff_2d", "channel_map"])
def test_fusion_amp_close_to_f32(rng, fusion_type):
    """Fusion paths under compute_dtype=bf16 (the AMP cast now happens at
    the bn0 boundary) stay within bf16 rounding of the f32 forward —
    guarding the AMP deviation the way the bench guard does for the
    non-fusion path (CLAUDE.md AMP rule)."""
    cfg = HTSATConfig(**TINY, enable_fusion=True, fusion_type=fusion_type)
    params = init_htsat_params(jax.random.PRNGKey(0), cfg)
    batch = _mel_batch(rng)
    f32 = jax.jit(functools.partial(htsat_apply, cfg=cfg))(params, batch)
    bf16 = jax.jit(functools.partial(
        htsat_apply, cfg=cfg, compute_dtype=jnp.bfloat16))(params, batch)
    a = np.asarray(f32["embedding"])
    b = np.asarray(bf16["embedding"], dtype=np.float32)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.995, cos


def test_1d_fusion_respects_longer_mask(rng):
    """Samples with longer=False must follow the global-channel-only path."""
    cfg = HTSATConfig(**TINY, enable_fusion=True, fusion_type="aff_1d")
    params = init_htsat_params(jax.random.PRNGKey(0), cfg)
    mel = rng.standard_normal((2, 4, 51, 16)).astype(np.float32)
    f = jax.jit(functools.partial(htsat_apply, cfg=cfg))
    out_none = f(params, {"mel_fusion": jnp.asarray(mel), "longer": jnp.zeros(2, bool)})
    # trash the local chunks: with longer=False everywhere, output unchanged
    mel2 = mel.copy()
    mel2[:, 1:] = 999.0
    out_trash = f(params, {"mel_fusion": jnp.asarray(mel2), "longer": jnp.zeros(2, bool)})
    np.testing.assert_allclose(
        np.asarray(out_none["embedding"]), np.asarray(out_trash["embedding"]), atol=1e-6
    )
    # with longer=True the local chunks must matter
    out_long = f(params, {"mel_fusion": jnp.asarray(mel), "longer": jnp.ones(2, bool)})
    out_long_trash = f(params, {"mel_fusion": jnp.asarray(mel2), "longer": jnp.ones(2, bool)})
    assert np.abs(np.asarray(out_long["embedding"]) - np.asarray(out_long_trash["embedding"])).max() > 1e-4


def test_fusion_featurize_roundtrip(rng):
    """Host featurizer fusion output feeds the fusion forward."""
    from audio_residual_tpu.data.featurize import get_audio_features

    cfg = HTSATConfig(**TINY, enable_fusion=True, fusion_type="aff_1d")
    params = init_htsat_params(jax.random.PRNGKey(0), cfg)
    audio_cfg = dict(sample_rate=48000, window_size=1024, hop_size=480, mel_bins=16, fmin=50, fmax=14000)
    samples = []
    for n in (60000, 10000):  # one long (>24000), one short
        s = get_audio_features(
            {}, rng.standard_normal(n).astype(np.float32) * 0.1, max_len=24000,
            data_truncating="fusion", data_filling="repeatpad", audio_cfg=audio_cfg,
            rng=rng,
        )
        samples.append(s)
    assert samples[0]["longer"] and not samples[1]["longer"]
    mel = jnp.asarray(np.stack([s["mel_fusion"] for s in samples]))
    longer = jnp.asarray(np.array([s["longer"] for s in samples]))
    out = jax.jit(functools.partial(htsat_apply, cfg=cfg))(params, {"mel_fusion": mel, "longer": longer})
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_rand_trunc_random_crops_long_audio(rng):
    """>max_len batches random-crop like the reference (`data.py:465-468`):
    different rng keys pick different crop windows, the default key is
    reproducible and NOT pinned to start-0 (r1 VERDICT weak #4)."""
    import jax

    from audio_residual_tpu.data.featurize import featurize_batch

    t, max_len = 30000, 10000
    wav = jnp.asarray(np.arange(4 * t, dtype=np.float32).reshape(4, t))
    d0 = featurize_batch(wav, max_len)
    d0b = featurize_batch(wav, max_len)
    np.testing.assert_array_equal(np.asarray(d0["waveform"]), np.asarray(d0b["waveform"]))
    assert np.asarray(d0["longer"]).all()
    # the seeded default is not the degenerate start-0 crop for every row
    starts = np.asarray(d0["waveform"])[:, 0] - np.arange(4) * t
    assert (starts > 0).any(), starts
    # distinct keys -> distinct crops; every crop is a contiguous slice
    d1 = featurize_batch(wav, max_len, rng=jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(d0["waveform"]), np.asarray(d1["waveform"]))
    w1 = np.asarray(d1["waveform"])
    np.testing.assert_array_equal(w1[:, 1:] - w1[:, :-1], 1.0)
