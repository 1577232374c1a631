"""Frequency (Fourier-feature) positional encoding.

TPU-native re-design of the reference encoder (reference:
``nerf-pytorch/nerf/nerf_helpers.py:115-169``). Instead of a Python loop that
appends ``sin``/``cos`` tensors per frequency band, we compute the whole
``(..., D * 2 * F)`` block with one broadcasted multiply + one fused
``sin``/``cos`` pair, which XLA folds into a single elementwise fusion on the
VPU. The layout matches the reference exactly:

    [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]

i.e. frequency-major, with the raw input first when ``include_input``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp


def encoding_dim(
    input_dim: int, num_frequencies: int, include_input: bool = True
) -> int:
    """Output feature size of :func:`positional_encoding`."""
    return input_dim * (2 * num_frequencies + (1 if include_input else 0))


def frequency_bands(
    num_frequencies: int, log_sampling: bool = True, dtype=jnp.float32
) -> jnp.ndarray:
    """The ``num_frequencies`` scales applied to the input.

    ``log_sampling`` picks 2**linspace(0, F-1, F); otherwise the bands are
    linearly spaced in [1, 2**(F-1)] (reference semantics,
    ``nerf_helpers.py:134-149``).
    """
    if num_frequencies <= 0:
        return jnp.zeros((0,), dtype=dtype)
    if log_sampling:
        return 2.0 ** jnp.linspace(
            0.0, num_frequencies - 1, num_frequencies, dtype=dtype
        )
    return jnp.linspace(
        2.0 ** 0.0, 2.0 ** (num_frequencies - 1), num_frequencies, dtype=dtype
    )


def positional_encoding(
    x: jnp.ndarray,
    num_frequencies: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., D]`` into ``[..., D * (2F + include_input)]``.

    Matches the reference output layout (input block first, then per-frequency
    ``sin`` then ``cos`` of the full D-vector), so checkpoints and goldens are
    directly comparable.
    """
    if num_frequencies <= 0:
        # Reference special case: no frequencies -> return the input unchanged.
        return x
    bands = frequency_bands(num_frequencies, log_sampling, dtype=x.dtype)
    # (..., 1, D) * (F, 1) -> (..., F, D)
    scaled = x[..., None, :] * bands[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # Interleave per-frequency sin/cos blocks: (..., F, 2, D) -> (..., F*2*D)
    enc = jnp.stack([sin, cos], axis=-2)
    enc = enc.reshape(*x.shape[:-1], num_frequencies * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def get_embedding_function(
    num_frequencies: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Closure form mirroring the reference helper (``nerf_helpers.py:162-169``)."""
    return functools.partial(
        positional_encoding,
        num_frequencies=num_frequencies,
        include_input=include_input,
        log_sampling=log_sampling,
    )
