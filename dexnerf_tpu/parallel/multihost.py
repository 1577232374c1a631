"""Multi-host (multi-process) training entry over DCN.

The reference has no distributed runtime at all (SURVEY.md §2.2); its
scale-out is "submit more k8s jobs". Here, multi-host TPU slices initialize
through the JAX distributed runtime: one process per host, ICI collectives
inside the slice, DCN only for the runtime's control plane and the initial
data distribution.

Usage (one process per host, e.g. under GKE with a TPU podslice):

    from dexnerf_tpu.parallel import multihost
    multihost.initialize()          # reads cluster env (or pass args)
    mesh = multihost.global_mesh()  # 1-D mesh over ALL chips in the slice
    ...build store/train step exactly as single-host; shard_map handles
    the rest (each process feeds its addressable shard)...

The data path: each host loads the full (small) scene and builds the same
replicated ray store; per-device PRNG folding (see
``sharding.make_parallel_train_step``) makes every chip sample a distinct
ray stream, so no host-side data sharding is needed at NeRF scales.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from dexnerf_tpu.parallel.mesh import RAY_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op for single process).

    With no args, relies on the environment auto-detection (GKE/TPU-VM
    metadata); explicit args cover manual clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D mesh over every chip in the slice (all processes)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(RAY_AXIS,))


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
