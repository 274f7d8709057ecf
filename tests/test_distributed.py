"""Multi-device (8 virtual CPU) data-parallel tests — the rebuild's fake
distributed backend (SURVEY.md §4 implication (d)).

Checks the distributed-correctness risks the reference left untested:
local-loss label offsets, gather gradient flow, and single- vs multi-device
loss equivalence.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from audio_residual_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from audio_residual_tpu.training import losses

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _outputs(n=16, d=8, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d)).astype(np.float32)
    t = rng.standard_normal((n, d)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    return {
        "audio_features": jnp.asarray(a),
        "text_features": jnp.asarray(t),
        "audio_features_mlp": jnp.asarray(a * 0.3),
        "text_features_mlp": jnp.asarray(t * 0.3),
        "logit_scale_a": jnp.asarray(10.0),
        "logit_scale_t": jnp.asarray(10.0),
    }


@pytest.mark.parametrize("mlp_loss", [False, True])
@pytest.mark.parametrize("local_loss", [False, True])
def test_sharded_loss_matches_single_device(mlp_loss, local_loss):
    """Global-batch ClipLoss under shard_map == single-device loss — covers
    the rank-offset labels of the `local_loss` variant (`loss.py:151-152`)."""
    mesh = data_parallel_mesh(8)
    outputs = _outputs()
    ref = float(losses.clip_loss(outputs, mlp_loss=mlp_loss))  # single device

    feature_keys = [k for k in outputs if k.startswith(("audio", "text"))]

    def per_shard(*feats):
        o = dict(zip(feature_keys, feats))
        o["logit_scale_a"] = outputs["logit_scale_a"]
        o["logit_scale_t"] = outputs["logit_scale_t"]
        return losses.clip_loss(
            o, axis_name="data", local_loss=local_loss, mlp_loss=mlp_loss
        )

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=tuple(P("data") for _ in feature_keys),
        out_specs=P(),
    )
    got = float(sharded(*[outputs[k] for k in feature_keys]))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_gather_features_grad_flows():
    """Differentiable all_gather (the `gather_with_grad` semantics)."""
    mesh = data_parallel_mesh(8)

    def loss_from_local(a, t):
        def inner(a_, t_):
            all_a, all_t = losses.gather_features(a_, t_, axis_name="data")
            return jax.lax.pmean(jnp.sum(all_a * all_t), "data")

        f = shard_map(inner, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
        return f(a, t)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    g = jax.grad(lambda a_: jnp.sum(loss_from_local(a_, t)))(a)
    # d/da sum(a*t) = t (every shard contributes its slice)
    np.testing.assert_allclose(np.asarray(g), np.asarray(t), rtol=1e-5)


@pytest.mark.slow
def test_dp_train_step_replicated_params_stay_synced():
    """One DP train step over the 8-device mesh: params stay replicated and
    finite (the implicit-allreduce property DDP provides)."""
    from audio_residual_tpu.training.train_clap import (
        init_train_state, make_optimizer, make_train_step,
    )
    from .tiny import TINY_CLAP, tiny_clap_params

    mesh = data_parallel_mesh(8)
    params = tiny_clap_params()
    optimizer = make_optimizer(lr=1e-4, warmup=5, total_steps=50)
    state = init_train_state(params, optimizer)
    state = replicate(mesh, state)

    rng = np.random.default_rng(0)
    b = 16
    batch = shard_batch(
        mesh,
        {
            "waveform": (rng.standard_normal((b, 24000)) * 0.1).astype(np.float32),
            "input_ids": rng.integers(2, 100, (b, 12)),
            "attention_mask": np.ones((b, 12), np.int32),
        },
    )
    step = make_train_step(TINY_CLAP, optimizer, mlp_loss=True)
    with mesh:
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params replicated: fully-addressable single value per param
    leaf = state["params"]["logit_scale_a"]
    assert leaf.sharding.is_fully_replicated

    # remat composes with the sharded step (jax.checkpoint under pjit) and
    # stays exact: same loss as the plain step from the same start state
    state_r = replicate(mesh, init_train_state(params, optimizer))
    step_r = make_train_step(TINY_CLAP, optimizer, mlp_loss=True, remat=True)
    with mesh:
        _, metrics_r = step_r(state_r, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics_r["loss"]), float(metrics["loss"]), rtol=1e-6)
