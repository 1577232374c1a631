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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from dexnerf_tpu.parallel.mesh import RAY_AXIS

# Environment variables whose presence means a cluster launcher (GKE, TPU-VM,
# SLURM, OpenMPI) configured this process and jax.distributed can
# auto-detect its coordinates.
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "SLURM_JOB_ID",
    "OMPI_MCA_orte_hnp_uri",
)


def in_cluster_env() -> bool:
    """True when a known cluster launcher environment is detected."""
    return any(v in os.environ for v in _CLUSTER_ENV_VARS)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime.

    Returns True when the distributed runtime was started. Explicit args
    cover manual clusters; with no args, auto-detection is attempted only
    when a cluster launcher environment is present (otherwise this is a
    single-process no-op rather than a hang/crash on non-cluster machines).
    """
    if num_processes is not None and num_processes <= 1:
        return False
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and not in_cluster_env()
    ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shutdown() -> None:
    """Tear down the distributed runtime (safe to call when not running)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def global_mesh() -> Mesh:
    """1-D mesh over every chip in the slice (all processes)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(RAY_AXIS,))


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
