"""Train-CLI flag wiring: the optimizer mux, the in-training validation
metrics, and the ``--pretrained-audio`` tower loaders — each flag the CLI
parses must change behavior (or say why it can't), the project's
flag-honesty rule."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
import torch

from audio_residual_tpu.evaluate.metrics import clap_val_metrics
from audio_residual_tpu.training.train_clap import make_optimizer

from . import reference_oracle as oracle


# ---- --optimizer mux -------------------------------------------------------

def _one_update(opt, grads, params):
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    return optax.apply_updates(params, updates)


def test_optimizer_sgd_matches_torch():
    """name="sgd" == torch optim.SGD(lr, momentum) (`utils.py:379-382`):
    heavy-ball buffer, no decay, over two steps."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 8)).astype(np.float32)
    g1 = rng.standard_normal((4, 8)).astype(np.float32)
    g2 = rng.standard_normal((4, 8)).astype(np.float32)
    lr, mom = 0.1, 0.9

    opt = make_optimizer(lr, name="sgd", momentum=mom, warmup=0, total_steps=10**9)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in (g1, g2):
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=lr, momentum=mom)
    for g in (g1, g2):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_optimizer_adam_forces_zero_decay():
    """name="adam" must behave as wd=0 (`main.py:312-314`), regardless of the
    wd argument."""
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))}
    grads = {"w": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))}
    kw = dict(beta1=0.9, beta2=0.999, eps=1e-8, warmup=0, total_steps=10**9)
    adam = _one_update(make_optimizer(1e-3, weight_decay=0.5, name="adam", **kw),
                       grads, params)
    adamw0 = _one_update(make_optimizer(1e-3, weight_decay=0.0, name="adamw", **kw),
                         grads, params)
    adamw5 = _one_update(make_optimizer(1e-3, weight_decay=0.5, name="adamw", **kw),
                         grads, params)
    np.testing.assert_array_equal(np.asarray(adam["w"]), np.asarray(adamw0["w"]))
    assert np.abs(np.asarray(adam["w"]) - np.asarray(adamw5["w"])).max() > 0


def test_optimizer_unknown_raises():
    with pytest.raises(ValueError):
        make_optimizer(1e-3, name="lamb")


def test_skip_scheduler_holds_base_lr():
    """--skip-scheduler: lr constant at the base value — no warmup ramp, no
    cosine decay. With sgd/momentum=0 the update is exactly -lr*grad at every
    step; the scheduled path at step 0 inside a warmup must differ."""
    g = {"w": jnp.ones((2, 2))}
    p = {"w": jnp.zeros((2, 2))}
    lr = 0.25

    skip = make_optimizer(lr, name="sgd", momentum=0.0, warmup=100,
                          total_steps=1000, skip_scheduler=True)
    state = skip.init(p)
    for _ in range(3):  # steps 0..2, all identical under skip
        updates, state = skip.update(g, state, p)
        np.testing.assert_allclose(np.asarray(updates["w"]), -lr, rtol=1e-6)

    sched = make_optimizer(lr, name="sgd", momentum=0.0, warmup=100,
                           total_steps=1000, skip_scheduler=False)
    updates, _ = sched.update(g, sched.init(p), p)
    assert abs(float(updates["w"][0, 0])) < lr * 0.02  # warmup start ~ 0


# ---- in-training validation metrics (get_metrics oracle) -------------------

@pytest.mark.parametrize("mlp_loss", [False, True])
def test_clap_val_metrics_matches_reference(mlp_loss):
    """clap_val_metrics == the reference's ``get_metrics``
    (`train.py:504-574`, AST-extracted): cumulative loss over the full val
    matrix, averaged-logit rankings under mlp_loss, R@k/mAP@10/ranks."""
    ref_fn = oracle.load_ref_train_get_metrics()
    rng = np.random.default_rng(7)
    n, d = 12, 16
    f = {}
    for k in ("a", "t", "am", "tm"):
        x = rng.standard_normal((n, d)).astype(np.float32)
        f[k] = x / np.linalg.norm(x, axis=-1, keepdims=True)
    sa, st = 11.0, 7.0

    kwargs = dict(
        audio_features=torch.from_numpy(f["a"]),
        text_features=torch.from_numpy(f["t"]),
        logit_scale_a=torch.tensor(sa),
        mlp_loss=mlp_loss,
    )
    if mlp_loss:
        kwargs.update(
            audio_features_mlp=torch.from_numpy(f["am"]),
            text_features_mlp=torch.from_numpy(f["tm"]),
            logit_scale_t=torch.tensor(st),
        )
    expected = ref_fn(**kwargs)

    got = clap_val_metrics(f["a"], f["t"], sa, f["am"], f["tm"], st,
                           mlp_loss=mlp_loss)
    assert set(expected) == set(got)
    for k, v in expected.items():
        np.testing.assert_allclose(got[k], float(v), rtol=1e-5, atol=1e-6,
                                   err_msg=k)


# ---- --pretrained-audio tower loaders --------------------------------------

def test_pretrained_audio_htsat_roundtrip(tmp_path):
    """Export tiny HTSAT params as a 'trained via HTSAT codebase' torch ckpt
    (state_dict + sed_model. prefix, `factory.py:198-205`) and load it back
    through the --pretrained-audio path: bit-identical tree."""
    from audio_residual_tpu.models import convert as convert_mod
    from audio_residual_tpu.models.factory import load_audio_tower_params

    from .tiny import TINY_CLAP, tiny_clap_params

    params = tiny_clap_params()
    sd = convert_mod.htsat_params_to_state_dict(
        jax.tree.map(np.asarray, params["audio_branch"]), prefix=""
    )
    ckpt = {"state_dict": {f"sed_model.{k}": torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()}}
    path = tmp_path / "HTSAT_fake_epoch_3.ckpt"
    torch.save(ckpt, str(path))

    loaded = load_audio_tower_params(str(path), "HTSAT-tiny", TINY_CLAP)
    flat_a, tree_a = jax.tree.flatten(jax.tree.map(np.asarray, params["audio_branch"]))
    flat_b, tree_b = jax.tree.flatten(loaded)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrained_audio_pann_roundtrip(tmp_path):
    """Same round trip for a PANN tower via convert_pann_state_dict (the
    inverse of the oracle's jax->torch mapping)."""
    from audio_residual_tpu.models.factory import load_audio_tower_params
    from audio_residual_tpu.models.pann import PANNConfig, init_pann_params

    cfg = PANNConfig(model_name="Cnn6", mel_bins=16, num_classes=13)
    params = jax.tree.map(np.asarray, init_pann_params(jax.random.PRNGKey(2), cfg))
    sd = oracle.pann_params_to_torch_state(params)
    ckpt = {"state_dict": {f"sed_model.{k}": v for k, v in sd.items()}}
    path = tmp_path / "PANN_fake.ckpt"
    torch.save(ckpt, str(path))

    class _C:  # only .audio.depths is read on the HTSAT path; unused here
        pass

    loaded = load_audio_tower_params(str(path), "PANN-6", _C())
    for top in ("bn0", "fc1", "fc_audioset"):
        fa, ta = jax.tree.flatten(params[top])
        fb, tb = jax.tree.flatten(loaded[top])
        assert ta == tb
        for a, b in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(loaded["conv_blocks"]) == len(params["conv_blocks"])
    for a, b in zip(params["conv_blocks"], loaded["conv_blocks"]):
        fa, _ = jax.tree.flatten(a)
        fb, _ = jax.tree.flatten(b)
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pretrained_audio_unknown_name_raises(tmp_path):
    """An unrecognised filename raises like `factory.py:187`."""
    from audio_residual_tpu.models.factory import load_audio_tower_params

    path = tmp_path / "mystery.ckpt"
    torch.save({"state_dict": {}}, str(path))
    with pytest.raises(ValueError):
        load_audio_tower_params(str(path), "HTSAT-tiny", None)
    with pytest.raises(ValueError):
        load_audio_tower_params(str(path), "PANN-14", None)
