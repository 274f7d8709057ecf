"""FSDP-style parameter/optimizer sharding over the data mesh (ZeRO-3
equivalent) — a TPU-native scaling extension BEYOND the reference.

The reference's only strategy is DDP with replicated parameters
(`training/distributed.py:63-139`); that caps the model size at one
device's HBM. On TPU the idiomatic fix is not a new runtime but a sharding
rule: place each large weight split over the SAME 1-D data mesh, constrain
the train step's outputs to that placement, and let GSPMD do the rest —
params are all-gathered just-in-time for each matmul (overlapped with
compute by XLA's latency-hiding scheduler) and the gradient ``psum`` that
plain DP would emit becomes a ``reduce_scatter``, so params, grads, Adam
mu/nu and the update math are all 1/N per chip. Same step function, same
loss, bit-comparable numerics; memory drops by the mesh size.

The rule is shape-based (not name-based) so one function covers params AND
optimizer state: Adam's mu/nu mirror the param shapes, so applying the same
rule leaf-wise keeps every tensor and its optimizer moments on the same
shards — no tree-structure bookkeeping.

Usage::

    mesh = data_parallel_mesh(8)
    state = shard_train_state(init_train_state(params, opt), mesh)
    step = make_train_step(cfg, opt, fsdp_mesh=mesh)   # train_clap.py
    state, metrics = step(state, shard_batch(mesh, batch), rng)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_spec", "fsdp_sharding", "shard_train_state", "constrain_tree"]

# Leaves smaller than this stay replicated: the all-gather latency for a
# tiny tensor costs more than the bytes saved (biases, LN/BN vectors,
# logit scales, position ids). 2^14 f32 = 64 KiB.
MIN_SHARD_ELEMS = 2 ** 14


def fsdp_spec(shape, n_devices: int, axis: str = "data",
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec for one tensor: shard the largest mesh-divisible dim.

    Only >=2-D tensors of at least ``min_elems`` elements shard; everything
    else replicates. Picking the LARGEST divisible dim maximises the bytes
    saved and keeps the per-shard blocks MXU-tileable (a 768-wide hidden dim
    split 8 ways is still 96 lanes; splitting a 4-long kernel dim would not
    be). Deterministic and shape-only, so params and their Adam moments land
    on identical shards.
    """
    if len(shape) < 2 or int(np.prod(shape)) < min_elems:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % n_devices == 0]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_sharding(x, mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NamedSharding for one array (or abstract value with ``.shape``)."""
    return NamedSharding(mesh, fsdp_spec(x.shape, mesh.shape[axis], axis))


def shard_train_state(state, mesh: Mesh, axis: str = "data"):
    """device_put every leaf of a train state by the FSDP rule.

    Works on the {params, opt_state, step} dict from ``init_train_state`` or
    any pytree: each leaf goes to its own shape-derived placement, so Adam
    mu/nu follow their params and scalars (step counts, schedules) replicate.
    """
    return jax.tree.map(lambda x: jax.device_put(x, fsdp_sharding(x, mesh, axis)), state)


def constrain_tree(tree, mesh: Mesh, axis: str = "data"):
    """``with_sharding_constraint`` every leaf by the FSDP rule (in-jit).

    Shapes are static at trace time, so the rule resolves during tracing;
    constraining grads here is what turns the DP gradient ``psum`` into a
    ``reduce_scatter`` in the compiled program.
    """
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, fsdp_sharding(x, mesh, axis)),
        tree,
    )
