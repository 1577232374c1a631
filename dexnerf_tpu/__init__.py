"""dexnerf_tpu — a TPU-native (JAX/XLA/Pallas) Dex-NeRF framework.

Brand-new implementation with the capabilities of the Dex-NeRF reference
stack (edwardyang12/Dex-NERF): hierarchical coarse/fine NeRF training from
posed RGB/IR images, σ-threshold metric depth extraction for transparent
objects, depth evaluation, novel-view rendering, three dataset formats, and
experiment infrastructure — re-designed TPU-first (static shapes, explicit
PRNG, `shard_map` data parallelism over a device mesh, Pallas hot kernels).
"""

__version__ = "0.1.0"

from dexnerf_tpu import core

__all__ = ["core", "__version__"]
