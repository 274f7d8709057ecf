"""Contrastive train-step behaviour tests: BN-stat updates, mixup, freeze,
logit-scale clamp, loss decrease on a fixed batch."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.training.train_clap import (
    MAX_LOGIT_SCALE,
    init_train_state,
    make_optimizer,
    make_train_step,
)

from .tiny import TINY_CLAP, tiny_clap_params


def _batch(rng, b=4, mixup=False):
    out = {
        "waveform": jnp.asarray((rng.standard_normal((b, 24000)) * 0.1).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(2, 100, (b, 12))),
        "attention_mask": jnp.ones((b, 12), jnp.int32),
    }
    if mixup:
        out["mixup_lambda"] = jnp.asarray(rng.beta(0.5, 0.5, b).astype(np.float32))
    return out


def test_remat_grads_exact():
    """``remat=True`` (jax.checkpoint over the dual-tower forward — the
    TPU memory-for-FLOPs trade) must produce EXACTLY the same step as the
    plain path: rematerialisation changes the schedule, not the math."""
    rng = np.random.default_rng(3)
    params = tiny_clap_params(0)
    optimizer = make_optimizer(lr=1e-3)
    batch = _batch(rng)
    key = jax.random.PRNGKey(7)
    outs = []
    for remat in (False, True):
        step = make_train_step(TINY_CLAP, optimizer, remat=remat)
        state = init_train_state(params, optimizer)
        new_state, metrics = step(state, batch, key)
        outs.append((metrics, new_state))
    m0, s0 = outs[0]
    m1, s1 = outs[1]
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0["params"]), jax.tree.leaves(s1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bn_running_stats_update():
    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    optimizer = make_optimizer(lr=1e-4, warmup=2, total_steps=10)
    state = init_train_state(params, optimizer)
    step = make_train_step(TINY_CLAP, optimizer)
    before = np.asarray(params["audio_branch"]["bn0"]["mean"]).copy()
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    after = np.asarray(state["params"]["audio_branch"]["bn0"]["mean"])
    assert not np.allclose(before, after), "bn0 running mean must update in training"


def test_logit_scale_clamped():
    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    params = dict(params, logit_scale_a=jnp.asarray(10.0), logit_scale_t=jnp.asarray(10.0))
    optimizer = make_optimizer(lr=1e-4, warmup=2, total_steps=10)
    state = init_train_state(params, optimizer)
    step = make_train_step(TINY_CLAP, optimizer)
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    assert float(state["params"]["logit_scale_a"]) <= MAX_LOGIT_SCALE + 1e-6


def test_freeze_text_keeps_text_params():
    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    optimizer = make_optimizer(lr=1e-2, warmup=0, total_steps=10)
    state = init_train_state(params, optimizer)
    step = make_train_step(TINY_CLAP, optimizer, freeze_text=True)
    before = np.asarray(params["text_branch"]["pooler"]["kernel"]).copy()
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(state["params"]["text_branch"]["pooler"]["kernel"]), before
    )
    # audio side DID move
    assert not np.allclose(
        np.asarray(state["params"]["audio_projection"]["fc1"]["kernel"]),
        np.asarray(params["audio_projection"]["fc1"]["kernel"]),
    )


def test_mixup_changes_loss():
    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    optimizer = make_optimizer(lr=1e-4, warmup=2, total_steps=10)
    step_plain = make_train_step(TINY_CLAP, optimizer)
    step_mix = make_train_step(TINY_CLAP, optimizer, mixup_alpha=0.5)
    state = init_train_state(params, optimizer)
    b = _batch(rng, mixup=True)
    _, m1 = step_plain(state, b, jax.random.PRNGKey(1))
    _, m2 = step_mix(state, b, jax.random.PRNGKey(1))
    assert float(m1["loss"]) != float(m2["loss"])


def test_loss_decreases_on_fixed_batch():
    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    optimizer = make_optimizer(lr=3e-4, warmup=0, total_steps=1000)
    state = init_train_state(params, optimizer)
    step = make_train_step(TINY_CLAP, optimizer)
    b = _batch(rng, b=6)
    losses = []
    for i in range(8):
        state, m = step(state, b, jax.random.PRNGKey(42))  # fixed rng: same dropout
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_split_optimizer_groups():
    from audio_residual_tpu.training.train_clap import make_split_optimizer

    rng = np.random.default_rng(0)
    params = tiny_clap_params()
    opt = make_split_optimizer(lr_pretrained=0.0, lr_new=1e-2, warmup=0, total_steps=100)
    state = init_train_state(params, opt)
    step = make_train_step(TINY_CLAP, opt)
    s2, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    # pretrained group lr=0 -> towers unchanged (bn0 stats excluded: they
    # update through the forward, not the optimizer)
    np.testing.assert_array_equal(
        np.asarray(s2["params"]["text_branch"]["pooler"]["kernel"]),
        np.asarray(params["text_branch"]["pooler"]["kernel"]),
    )
    # new group lr>0 -> projections moved
    assert not np.allclose(
        np.asarray(s2["params"]["audio_projection"]["fc1"]["kernel"]),
        np.asarray(params["audio_projection"]["fc1"]["kernel"]),
    )
