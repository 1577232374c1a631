"""NeRF MLP model families (flax.linen), mirroring the reference model zoo.

Re-designs of the five architectures in ``nerf-pytorch/nerf/models.py``:

* ``VeryTinyNeRFModel``   (reference ``models.py:4-31``)
* ``MultiHeadNeRFModel``  (reference ``models.py:34-78``)
* ``ReplicateNeRFModel``  (reference ``models.py:81-120``)
* ``PaperNeRFModel``      (reference ``models.py:123-182``)
* ``FlexibleNeRFModel``   (reference ``models.py:185-256``) — the one every
  shipped config uses.

Differences from the reference, on purpose:

* ``FlexibleNeRFModel`` honors ``num_layers``/``hidden_size``/
  ``skip_connect_every`` from config (the reference train scripts silently
  drop them, ``train_nerf_rgb.py:122-128``), and its skip connection is
  implemented correctly (the reference ``forward`` references a nonexistent
  ``self.linear_layers`` and would crash if the skip branch ran,
  ``models.py:243``).
* Initialization matches torch ``nn.Linear`` defaults (uniform
  ±1/sqrt(fan_in) for kernel and bias) so training dynamics are comparable.
* Inputs are the already-encoded ``[.., dim_xyz + dim_dir]`` features, same
  packing as the reference: xyz encoding first, then viewdir encoding.

All models map encoded features -> ``[..., 4]`` (rgb logits + σ logit).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _canonical_dtype(dtype):
    """Accept strings from config ("float32"/"bfloat16") or jnp dtypes."""
    if isinstance(dtype, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    return dtype


def _bounded_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Dense(nn.Module):
    """Linear layer with torch ``nn.Linear``-style init: kernel and bias both
    uniform(±1/sqrt(fan_in)), so training dynamics match the reference.

    ``dtype`` is the compute dtype: parameters are stored float32 and cast
    for the matmul (bfloat16 compute runs the MXU at full rate on TPU;
    float32 uses the slower multi-pass path).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel", _bounded_uniform(bound), (fan_in, self.features)
        )
        bias = self.param("bias", _bounded_uniform(bound), (self.features,))
        x = x.astype(self.dtype)
        y = x @ kernel.astype(self.dtype)
        return y + bias.astype(self.dtype)


def _dims(num_encoding_fn_xyz, num_encoding_fn_dir, include_input_xyz,
          include_input_dir):
    dim_xyz = (3 if include_input_xyz else 0) + 2 * 3 * num_encoding_fn_xyz
    dim_dir = (3 if include_input_dir else 0) + 2 * 3 * num_encoding_fn_dir
    return dim_xyz, dim_dir


class VeryTinyNeRFModel(nn.Module):
    """3-layer MLP over concat(xyz_enc, dir_enc) (reference ``models.py:4-31``)."""

    filter_size: int = 128
    num_encoding_functions: int = 6
    use_viewdirs: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Dense(self.filter_size)(x))
        x = nn.relu(Dense(self.filter_size)(x))
        return Dense(4)(x)


class MultiHeadNeRFModel(nn.Module):
    """Separate σ and rgb heads; viewdirs join before the rgb trunk
    (reference ``models.py:34-78``)."""

    hidden_size: int = 128
    num_encoding_functions: int = 6
    use_viewdirs: bool = True

    @nn.compact
    def __call__(self, x):
        dim_xyz = 3 + 3 * 2 * self.num_encoding_functions
        xyz, view = x[..., :dim_xyz], x[..., dim_xyz:]
        h = nn.relu(Dense(self.hidden_size)(xyz))
        h = nn.relu(Dense(self.hidden_size)(h))
        sigma = Dense(1)(h)
        feat = nn.relu(Dense(self.hidden_size)(h))
        h = jnp.concatenate([feat, view], axis=-1)
        h = nn.relu(Dense(self.hidden_size)(h))
        h = nn.relu(Dense(self.hidden_size)(h))
        rgb = Dense(3)(h)
        return jnp.concatenate([rgb, sigma], axis=-1)


class ReplicateNeRFModel(nn.Module):
    """Small NeRF following the paper's supplementary figure
    (reference ``models.py:81-120``)."""

    hidden_size: int = 256
    num_layers: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True

    @nn.compact
    def __call__(self, x):
        dim_xyz, _ = _dims(
            self.num_encoding_fn_xyz,
            self.num_encoding_fn_dir,
            self.include_input_xyz,
            self.include_input_dir,
        )
        xyz, direction = x[..., :dim_xyz], x[..., dim_xyz:]
        h = nn.relu(Dense(self.hidden_size)(xyz))
        h = nn.relu(Dense(self.hidden_size)(h))
        feat = Dense(self.hidden_size)(h)
        alpha = Dense(1)(h)
        y = nn.relu(
            Dense(self.hidden_size // 2)(
                jnp.concatenate([feat, direction], axis=-1)
            )
        )
        y = nn.relu(Dense(self.hidden_size // 2)(y))
        rgb = Dense(3)(y)
        return jnp.concatenate([rgb, alpha], axis=-1)


class PaperNeRFModel(nn.Module):
    """The 8x256 NeRF from Fig. 7 of the paper (reference ``models.py:123-182``):
    skip concat of the xyz encoding at layer 4, 256-d feature -> σ, then a
    128-d viewdir branch -> rgb."""

    num_layers: int = 8
    hidden_size: int = 256
    skip_connect_every: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True

    @nn.compact
    def __call__(self, x):
        dim_xyz, _ = _dims(
            self.num_encoding_fn_xyz,
            self.num_encoding_fn_dir,
            self.include_input_xyz,
            self.include_input_dir,
        )
        xyz, dirs = x[..., :dim_xyz], x[..., dim_xyz:]
        h = xyz
        for i in range(8):
            if i == 4:
                h = Dense(256)(jnp.concatenate([xyz, h], axis=-1))
            else:
                h = Dense(256)(h)
            h = nn.relu(h)
        feat = Dense(256)(h)
        alpha = Dense(1)(feat)
        if self.use_viewdirs:
            h = Dense(128)(jnp.concatenate([feat, dirs], axis=-1))
        else:
            h = Dense(128)(feat)
        h = nn.relu(h)
        for _ in range(2):
            h = nn.relu(Dense(128)(h))
        rgb = Dense(3)(h)
        return jnp.concatenate([rgb, alpha], axis=-1)


class FlexibleNeRFModel(nn.Module):
    """Configurable-depth NeRF MLP — the workhorse model
    (reference ``models.py:185-256``, with the skip-connection bug fixed and
    config knobs honored)."""

    num_layers: int = 4
    hidden_size: int = 128
    skip_connect_every: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True
    dtype: Any = jnp.float32  # compute dtype; "bfloat16" for full MXU rate

    @nn.compact
    def __call__(self, x):
        dtype = _canonical_dtype(self.dtype)
        dim_xyz, _ = _dims(
            self.num_encoding_fn_xyz,
            self.num_encoding_fn_dir,
            self.include_input_xyz,
            self.include_input_dir,
        )
        if self.use_viewdirs:
            xyz, view = x[..., :dim_xyz], x[..., dim_xyz:]
        else:
            xyz = x[..., :dim_xyz]
        xyz = xyz.astype(dtype)

        h = Dense(self.hidden_size, dtype=dtype)(xyz)
        num_trunk = self.num_layers - 1
        for i in range(num_trunk):
            if (
                i % self.skip_connect_every == 0
                and i > 0
                and i != num_trunk - 1
            ):
                h = jnp.concatenate([h, xyz], axis=-1)
            h = nn.relu(Dense(self.hidden_size, dtype=dtype)(h))

        if self.use_viewdirs:
            feat = nn.relu(Dense(self.hidden_size, dtype=dtype)(h))
            alpha = Dense(1, dtype=dtype)(h)
            y = jnp.concatenate([feat, view.astype(dtype)], axis=-1)
            y = nn.relu(Dense(self.hidden_size // 2, dtype=dtype)(y))
            rgb = Dense(3, dtype=dtype)(y)
            # raw field logits back to f32 for compositing stability
            return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
        return Dense(4, dtype=dtype)(h).astype(jnp.float32)
