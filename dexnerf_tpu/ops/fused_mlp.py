"""Fused positional-encoding + NeRF-MLP field evaluation (Pallas TPU kernel).

The BASELINE.json north star: "the per-ray hot loop (positional encoding →
MLP with skip → alpha-compositing) fuses into Pallas kernels so encoded
samples never round-trip to HBM". This kernel implements the PE→MLP part for
``FlexibleNeRFModel``: for each block of samples, the frequency encoding of
positions and view directions is built directly in VMEM, the whole trunk
(with its skip concatenation) plus σ/rgb heads run as back-to-back MXU
matmuls on VMEM-resident weights, and only the [S, 4] raw radiance field is
written back to HBM.

Versus the XLA path (``render.make_mlp_field``), this removes the [S, D_enc]
encoded-features round trip and all [S, hidden] inter-layer activations from
HBM traffic. Used on the no-grad paths (validation / novel-view rendering /
depth extraction); training keeps the XLA pipeline (autodiff through a
custom-VJP kernel is future work — the train step is already MXU-bound).

Layer structure mirrors ``dexnerf_tpu.models.mlp.FlexibleNeRFModel``
(reference semantics: ``nerf-pytorch/nerf/models.py:185-256``, skip bug
fixed): layer1 (no activation), trunk with relu + skip-concat, then
feat/alpha/dir/rgb heads.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexnerf_tpu.models.mlp import FlexibleNeRFModel
from dexnerf_tpu.render.renderer import FieldFn


def _pe_in_kernel(x, num_freq: int, include_input: bool):
    """Positional encoding built inside the kernel ([B, 3] -> [B, D])."""
    parts = [x] if include_input else []
    for i in range(num_freq):
        scaled = x * (2.0 ** i)
        parts.append(jnp.sin(scaled))
        parts.append(jnp.cos(scaled))
    return jnp.concatenate(parts, axis=-1)


def _flex_param_layout(model: FlexibleNeRFModel) -> List[str]:
    """Dense submodule names in call order (must match models/mlp.py)."""
    n_dense = model.num_layers  # layer1 + (num_layers - 1) trunk
    names = [f"Dense_{i}" for i in range(n_dense)]
    if model.use_viewdirs:
        names += [f"Dense_{n_dense}", f"Dense_{n_dense + 1}",
                  f"Dense_{n_dense + 2}", f"Dense_{n_dense + 3}"]
    else:
        names += [f"Dense_{n_dense}"]
    return names


def flatten_flex_params(model: FlexibleNeRFModel, params: Any):
    """Flax param tree -> flat (kernels..., biases...) tuple in call order."""
    tree = params["params"] if "params" in params else params
    ks, bs = [], []
    for name in _flex_param_layout(model):
        ks.append(jnp.asarray(tree[name]["kernel"]))
        bs.append(jnp.asarray(tree[name]["bias"]))
    return tuple(ks), tuple(bs)


def _skip_indices(model: FlexibleNeRFModel) -> List[int]:
    num_trunk = model.num_layers - 1
    return [
        i
        for i in range(num_trunk)
        if i % model.skip_connect_every == 0 and i > 0 and i != num_trunk - 1
    ]


def _make_kernel(model: FlexibleNeRFModel):
    """Kernel body closed over the (static) layer structure."""
    skip = set(_skip_indices(model))
    num_trunk = model.num_layers - 1
    use_viewdirs = model.use_viewdirs
    fx, fd = model.num_encoding_fn_xyz, model.num_encoding_fn_dir
    inc_x, inc_d = model.include_input_xyz, model.include_input_dir

    def kernel(*refs):
        # refs: pts, dirs?, k0..kL, b0..bL, out
        n_layers = model.num_layers + (4 if use_viewdirs else 1)
        pts_ref = refs[0]
        off = 1
        if use_viewdirs:
            dirs_ref = refs[1]
            off = 2
        k_refs = refs[off : off + n_layers]
        b_refs = refs[off + n_layers : off + 2 * n_layers]
        out_ref = refs[-1]

        def dense(x, i, relu):
            y = (
                jax.lax.dot_general(
                    x,
                    k_refs[i][:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b_refs[i][:]
            )
            return jnp.maximum(y, 0.0) if relu else y

        xyz = _pe_in_kernel(pts_ref[:], fx, inc_x)
        h = dense(xyz, 0, relu=False)  # layer1: no activation (reference)
        li = 1
        for i in range(num_trunk):
            if i in skip:
                h = jnp.concatenate([h, xyz], axis=-1)
            h = dense(h, li, relu=True)
            li += 1

        if use_viewdirs:
            feat = dense(h, li, relu=True)  # fc_feat
            alpha = dense(h, li + 1, relu=False)  # fc_alpha
            dir_enc = _pe_in_kernel(dirs_ref[:], fd, inc_d)
            y = jnp.concatenate([feat, dir_enc], axis=-1)
            y = dense(y, li + 2, relu=True)  # layers_dir[0]
            rgb = dense(y, li + 3, relu=False)  # fc_rgb
            out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)
        else:
            out_ref[:] = dense(h, li, relu=False)

    return kernel


def make_fused_flexible_field(
    model: FlexibleNeRFModel,
    *,
    block_samples: int = 512,
    interpret: bool = False,
) -> FieldFn:
    """Build a FieldFn (params, pts[N,S,3], viewdirs[N,3]|None) -> raw[N,S,4]
    running the fused Pallas kernel."""
    kernel = _make_kernel(model)
    use_viewdirs = model.use_viewdirs

    def field(params, pts, viewdirs):
        N, S, _ = pts.shape
        total = N * S
        block = min(block_samples, total)
        pad = (-total) % block
        pts_flat = pts.reshape(total, 3)
        if pad:
            pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
        inputs = [pts_flat]
        if use_viewdirs:
            dirs_flat = jnp.broadcast_to(
                viewdirs[:, None, :], (N, S, 3)
            ).reshape(total, 3)
            if pad:
                dirs_flat = jnp.pad(dirs_flat, ((0, pad), (0, 0)))
            inputs.append(dirs_flat)

        ks, bs = flatten_flex_params(model, params)
        n_layers = len(ks)
        padded = total + pad
        grid = (padded // block,)

        sample_spec = pl.BlockSpec(
            (block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs = [sample_spec] * len(inputs)
        in_specs += [
            pl.BlockSpec(k.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in ks
        ]
        in_specs += [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs
        ]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(*inputs, *ks, *bs)
        return out[:total].reshape(N, S, 4)

    return field
