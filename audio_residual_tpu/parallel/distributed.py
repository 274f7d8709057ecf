"""Multi-host initialization + environment rendezvous.

Reference: `training/distributed.py:24-139` — rank/world discovery from
SLURM / OpenMPI / PMI / torchrun env vars, three init paths (Horovod, DDP,
torchrun), per-rank CUDA pinning, master helpers.

TPU-native: one process per HOST (not per chip); ``jax.distributed.
initialize()`` wires all hosts into a single global device view, after which
the data-parallel mesh and jitted train step are identical to single-host.
Rendezvous coordinates come from the same env conventions the reference
supported, so SLURM launch scripts port directly.
"""

from __future__ import annotations

import logging
import os

import jax

__all__ = ["world_info_from_env", "init_distributed", "is_master", "local_device_count"]


def world_info_from_env() -> tuple[int, int, str | None]:
    """(process_id, num_processes, coordinator) from SLURM / OpenMPI / PMI /
    torchrun-style env (`distributed.py:43-60`)."""
    for rank_var, size_var in (
        ("SLURM_PROCID", "SLURM_NTASKS"),
        ("OMPI_COMM_WORLD_RANK", "OMPI_COMM_WORLD_SIZE"),
        ("PMI_RANK", "PMI_SIZE"),
        ("RANK", "WORLD_SIZE"),
    ):
        if rank_var in os.environ and size_var in os.environ:
            rank = int(os.environ[rank_var])
            size = int(os.environ[size_var])
            coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("MASTER_ADDR")
            if coord and "MASTER_PORT" in os.environ and ":" not in coord:
                coord = f"{coord}:{os.environ['MASTER_PORT']}"
            return rank, size, coord
    return 0, 1, None


def init_distributed(coordinator: str | None = None) -> dict:
    """Initialise the multi-host JAX runtime when a world is configured;
    single-host no-op otherwise. Returns {rank, world_size, devices}."""
    rank, size, env_coord = world_info_from_env()
    coordinator = coordinator or env_coord
    if size > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=size, process_id=rank
        )
        logging.info(
            "jax.distributed initialised: process %d/%d, %d global devices",
            rank, size, jax.device_count(),
        )
    return {
        "rank": rank,
        "world_size": size,
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_master(rank: int | None = None) -> bool:
    return (rank if rank is not None else jax.process_index()) == 0


def local_device_count() -> int:
    return jax.local_device_count()
