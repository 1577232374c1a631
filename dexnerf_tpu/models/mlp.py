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

    The input may be a TUPLE of feature blocks: the layer then behaves
    exactly like ``Dense(concat(parts, -1))`` — one kernel of shape
    [sum(fan_in), features], sliced per part — but evaluates as a SUM of
    per-part matmuls, so XLA never materializes the concatenated
    activation. This is the HBM-traffic eliminator for NeRF's skip/viewdir
    concats: the compiled train step otherwise writes 100-200 MB
    ``[rays, samples, hidden+dim_xyz]`` concat intermediates per step
    (docs/PERF_NOTES.md "HLO inspection findings"). Param shapes and
    numerics are unchanged, so checkpoints and the torch importer are
    unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (tuple, list)) else (x,)
        fan_in = sum(p.shape[-1] for p in parts)
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel", _bounded_uniform(bound), (fan_in, self.features)
        )
        bias = self.param("bias", _bounded_uniform(bound), (self.features,))
        kernel = kernel.astype(self.dtype)
        out_rank = max(p.ndim for p in parts)
        y = None
        off = 0
        for p in parts:
            w = kernel[off : off + p.shape[-1]]
            off += p.shape[-1]
            t = p.astype(self.dtype) @ w
            # lower-rank parts (e.g. per-RAY viewdir features joining
            # per-SAMPLE activations) broadcast across the missing middle
            # axes — their matmul runs once per ray instead of once per
            # sample, a samples-per-ray(x) FLOP and HBM saving
            while t.ndim < out_rank:
                t = t[..., None, :]
            y = t if y is None else y + t
        return y + bias.astype(self.dtype)


def _dims(num_encoding_fn_xyz, num_encoding_fn_dir, include_input_xyz,
          include_input_dir):
    dim_xyz = (3 if include_input_xyz else 0) + 2 * 3 * num_encoding_fn_xyz
    dim_dir = (3 if include_input_dir else 0) + 2 * 3 * num_encoding_fn_dir
    return dim_xyz, dim_dir


def _split_xyz_view(x, dim_xyz):
    """(xyz_enc, view_enc) from either a packed [..., Dx+Dd] array (the
    reference's input layout) or an (xyz_enc, view_enc) tuple (the split
    layout, where view_enc may be per-ray — one rank lower)."""
    if isinstance(x, (tuple, list)):
        return x[0], (x[1] if len(x) > 1 else None)
    return x[..., :dim_xyz], x[..., dim_xyz:]


def _as_packed(x, dim_xyz):
    """Packed [..., Dx+Dd] view of either input form (for models that
    consume the raw concatenation)."""
    if not isinstance(x, (tuple, list)):
        return x
    xyz, view = x[0], (x[1] if len(x) > 1 else None)
    if view is None:
        return xyz
    if view.ndim < xyz.ndim:
        view = jnp.broadcast_to(
            view[..., None, :], (*xyz.shape[:-1], view.shape[-1])
        )
    return jnp.concatenate([xyz, view], axis=-1)


class VeryTinyNeRFModel(nn.Module):
    """3-layer MLP over concat(xyz_enc, dir_enc) (reference ``models.py:4-31``)."""

    filter_size: int = 128
    num_encoding_functions: int = 6
    use_viewdirs: bool = True

    @nn.compact
    def __call__(self, x):
        x = _as_packed(x, 3 + 3 * 2 * self.num_encoding_functions)
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
        xyz, view = _split_xyz_view(x, dim_xyz)
        h = nn.relu(Dense(self.hidden_size)(xyz))
        h = nn.relu(Dense(self.hidden_size)(h))
        sigma = Dense(1)(h)
        feat = nn.relu(Dense(self.hidden_size)(h))
        h = nn.relu(Dense(self.hidden_size)((feat, view)))
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
        xyz, direction = _split_xyz_view(x, dim_xyz)
        h = nn.relu(Dense(self.hidden_size)(xyz))
        h = nn.relu(Dense(self.hidden_size)(h))
        feat = Dense(self.hidden_size)(h)
        alpha = Dense(1)(h)
        y = nn.relu(Dense(self.hidden_size // 2)((feat, direction)))
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
        xyz, dirs = _split_xyz_view(x, dim_xyz)
        h = xyz
        for i in range(8):
            if i == 4:
                h = Dense(256)((xyz, h))
            else:
                h = Dense(256)(h)
            h = nn.relu(h)
        feat = Dense(256)(h)
        alpha = Dense(1)(feat)
        if self.use_viewdirs:
            h = Dense(128)((feat, dirs))
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
        view = None
        if isinstance(x, (tuple, list)):
            # split input: (xyz_enc [.., S, Dx], dir_enc [.., Dd]) — the
            # dir encoding may be PER-RAY (one rank lower); its matmul then
            # runs per ray and broadcasts across samples (see Dense)
            xyz, view = x if self.use_viewdirs else (x[0], None)
        elif self.use_viewdirs:
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
                # skip concat as a split matmul (see Dense docstring);
                # reference order is cat(h, xyz) (models.py:244)
                h = nn.relu(Dense(self.hidden_size, dtype=dtype)((h, xyz)))
            else:
                h = nn.relu(Dense(self.hidden_size, dtype=dtype)(h))

        if self.use_viewdirs:
            feat = nn.relu(Dense(self.hidden_size, dtype=dtype)(h))
            alpha = Dense(1, dtype=dtype)(h)
            y = nn.relu(
                Dense(self.hidden_size // 2, dtype=dtype)(
                    (feat, view.astype(dtype))
                )
            )
            rgb = Dense(3, dtype=dtype)(y)
            # raw field logits back to f32 for compositing stability
            return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
        return Dense(4, dtype=dtype)(h).astype(jnp.float32)
