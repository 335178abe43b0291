"""Multi-host SPMD bootstrap — the reference's DDP launcher, TPU-style.

The reference spawns workers via a temp script + ``torch.distributed.run``
and NCCL process groups (``utils/dist.py:25-66``, ``engine/trainer.py:
218-229``). On TPU pods every host runs the SAME program: one
``jax.distributed.initialize`` call connects the processes, after which
``jit`` over a global Mesh compiles collectives over ICI/DCN. No subprocess
relaunch, no rank-conditional wrappers — rank only picks the data shard.

``ensure_initialized`` is idempotent and a no-op single-host, so every entry
point can call it unconditionally:
  * TPU pods: JAX autodetects the coordinator from the TPU metadata; no env
    needed.
  * CPU/GPU clusters: set JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) like torchrun's MASTER_ADDR/WORLD_SIZE/RANK.
"""
from __future__ import annotations

import os

import jax

_INITIALIZED = False


def ensure_initialized() -> tuple[int, int]:
    """Connect this process to the cluster if one is configured; returns
    (process_index, process_count)."""
    global _INITIALIZED
    if not _INITIALIZED:
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        if coord and nproc:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
            )
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def local_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading — the
    DistributedSampler equivalent (reference data/build.py:144)."""
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 check for logging/checkpoint writes (reference RANK in
    utils/__init__.py:33)."""
    return jax.process_index() == 0
