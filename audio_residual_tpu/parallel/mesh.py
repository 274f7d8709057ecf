"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/Horovod distributed init (`training/distributed.py:63-139`).

The reference implements exactly one model-scale strategy (SURVEY.md §2.6):
data parallelism with a global feature all_gather for the contrastive loss.
Its TPU-native form: a 1-D ``Mesh("data")``, params replicated, batch sharded,
XLA collectives over ICI (``all_gather`` for features, implicit ``psum`` for
grads under jit). Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no code change in the train step.

``data_parallel_mesh(n)`` works both on real chips and on the virtual CPU
mesh (``xla_force_host_platform_device_count``), which is how multi-chip
behaviour is tested without hardware.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_parallel_mesh", "shard_batch", "replicate", "P", "Mesh", "NamedSharding"]


def data_parallel_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"data_parallel_mesh({n_devices}) needs {n_devices} devices but the "
                f"{devs[0].platform if devs else '?'} backend exposes {len(devs)}; "
                "a silent smaller mesh would fake multi-chip coverage"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate params across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
