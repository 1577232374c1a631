"""Device mesh construction.

The reference is strictly single-process/single-GPU (SURVEY.md §2.2); its
scale-out story is "launch more k8s jobs". Here parallelism is first-class:
a 1-D ``jax.sharding.Mesh`` over all local (or a requested number of)
devices, with the ray batch sharded across the ``rays`` axis — rays are
embarrassingly parallel, so ray-axis data parallelism IS the natural
TP/SP/CP story for a NeRF (params stay replicated; gradients ``psum`` over
ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(
    num_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over ``num_devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
