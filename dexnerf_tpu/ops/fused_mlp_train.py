"""Fused PE+MLP field with a custom VJP — the training-path Pallas kernel.

Profiling (docs/PERF_NOTES.md) shows the XLA train step spends ~72% of device
time on elementwise fusions whose cost is HBM traffic: the positional
encodings and every inter-layer activation round-trip to HBM in both the
forward and backward pass. This module fuses the whole field evaluation for
``FlexibleNeRFModel`` into two Pallas kernels:

* **forward**: shared with ``fused_mlp.make_fused_flexible_field`` (PE in
  VMEM → aligned split matmuls → [B, 4] raw output);
* **backward**: per sample-block, RECOMPUTES the forward activations in VMEM
  (rematerialization) and backpropagates the incoming cotangent, accumulating
  weight/bias gradients across grid steps directly in VMEM-resident output
  blocks (TPU grids are sequential, so ``+=`` accumulation is race-free).

IMPORTANT CONTRACT: the custom VJP returns **zero cotangents for the sample
points and view directions**. In the NeRF training graph this is exact —
coarse depths come from the (parameter-free) stratified sampler and fine
depths are ``stop_gradient``-ed (reference ``train_utils.py:170``), so no
gradient flows into the MLP inputs. Do NOT use this field in a graph where
``pts`` depends on trainable parameters (e.g. pose optimization) — use the
XLA field there.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexnerf_tpu.models.mlp import FlexibleNeRFModel
from dexnerf_tpu.ops.fused_mlp import (
    _dims,
    _expand_rows,
    _field_parts,
    _flex_param_layout,
    _forward_block_parts,
    _num_mats,
    _pe_in_kernel,
    _ray_blocking,
    _skip_indices,
    make_fused_flexible_field,
    split_flex_params,
)
from dexnerf_tpu.render.renderer import FieldFn


def _backward_chain(
    model: FlexibleNeRFModel,
    compute_dtype,
    dw_dtype,
    mats,
    dmats,
    dbs,
    saved,
    xyz,
    dir_enc,
    g,
    *,
    _skip_dw: bool = False,
):
    """Backpropagate ``g`` [B, 4] (cotangent of the raw field) through the
    MLP, accumulating weight/bias grads into the grid-accumulated output refs.

    ``saved`` = ``(trunk_inputs, a_last, feat, y)`` from
    ``_forward_block(..., keep_activations=True)``. Shared by the
    standalone backward kernel (which recomputes the forward first) and the
    combined loss kernel (``fused_train_loss``, activations still live).
    Relu masks are DERIVED here (``act > 0`` on the saved post-relu
    activations) rather than saved — halves the saved-state VMEM again.

    Dtype discipline (the round-1 Mosaic-crash fix, see
    ``fused_mlp._forward_block``): the whole delta chain — selects, adds,
    accumulators — is float32; ``compute_dtype`` casts only dot operands.
    ``dw_dtype`` controls the dW contraction operands separately.
    """
    return _backward_chain_parts(
        model, compute_dtype, dw_dtype, mats, dmats, dbs, (saved,),
        (xyz,), (dir_enc,), (g,), _skip_dw=_skip_dw,
    )


def _backward_chain_parts(
    model: FlexibleNeRFModel,
    compute_dtype,
    dw_dtype,
    mats,
    dmats,
    dbs,
    saveds,
    xyz_parts,
    dir_parts,
    gs,
    *,
    _skip_dw: bool = False,
):
    """``_backward_chain`` over P independent row-parts, ops interleaved
    (the delta chain is latency-bound like the forward — see
    ``fused_mlp._forward_block_parts``). dW/db accumulate the SUM over
    parts into the grid-accumulated refs, so gradients are exactly the
    full-block values."""
    skip = set(_skip_indices(model))
    num_trunk = model.num_layers - 1
    dw = dw_dtype if dw_dtype is not None else jnp.float32
    P = len(saveds)
    trunk_inputs_p = [s[0] for s in saveds]
    a_last_p = [s[1] for s in saveds]
    feat_p = [s[2] for s in saveds]
    y_p = [s[3] for s in saveds]

    def relu_mask(act):
        # 0/1 f32 multiply operand from a saved post-relu activation
        # (f32 compare + f32 select — never a bf16 select, the round-1
        # Mosaic crasher)
        return jnp.where(act.astype(jnp.float32) > 0, 1.0, 0.0)

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val

    def matT(a, b):
        # a[B, I] x b[B, O] -> [I, O] f32 via a dim-0/dim-0 contraction
        # (Mosaic rejects an explicit in-kernel swapaxes). Operand dtype
        # is ``dw_dtype``: f32 is the historically-safe form.
        if _skip_dw:  # timing-bisection mode: zero-cost dW stand-in
            return jnp.zeros((a.shape[1], b.shape[1]), jnp.float32)
        return jax.lax.dot_general(
            a.astype(dw),
            b.astype(dw),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def matWT(delta, w):
        # delta[B, O] @ W^T as a dim-1/dim-1 contraction on the FORWARD
        # weight — no host-side transposed copy streams into the kernel
        # (halves the weight VMEM/HBM footprint; Mosaic accepts arbitrary
        # single-dim contractions, only explicit swapaxes is rejected).
        # Operands in the weight's dtype (compute_dtype), f32 accumulation.
        return jax.lax.dot_general(
            delta.astype(w.dtype), w[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # matmul-operand index bookkeeping (mirror of _forward_block)
    mi_layer1 = 0
    mi = 1
    trunk_mi = []
    for i in range(num_trunk):
        trunk_mi.append(mi)
        mi += 2 if i in skip else 1
    mi_feat, mi_alpha, mi_dir_h, mi_dir_d, mi_rgb = (
        mi, mi + 1, mi + 2, mi + 3, mi + 4
    )
    li = model.num_layers  # bias index of fc_feat

    def psum(vals):
        total = vals[0]
        for v in vals[1:]:
            total = total + v
        return total

    # relu backprop is a MULTIPLY by a derived 0/1 mask (no saved masks)
    # rgb head: padded 4-wide weight, full-g matmuls (the zero column
    # routes alpha's cotangent nowhere; assemble slices the dW)
    acc(dmats[mi_rgb], psum([matT(y_p[p], gs[p]) for p in range(P)]))
    acc(dbs[li + 3], psum([jnp.sum(gs[p][:, 0:3], axis=0) for p in range(P)]))
    dy = tuple(matWT(gs[p], mats[mi_rgb]) for p in range(P))
    # dir layer (split matmul); whole delta chain f32
    dz_y = tuple(dy[p] * relu_mask(y_p[p]) for p in range(P))
    acc(dmats[mi_dir_h], psum([matT(feat_p[p], dz_y[p]) for p in range(P)]))
    acc(dmats[mi_dir_d],
        psum([matT(dir_parts[p], dz_y[p]) for p in range(P)]))
    acc(dbs[li + 2], psum([jnp.sum(dz_y[p], axis=0) for p in range(P)]))
    dfeat = tuple(matWT(dz_y[p], mats[mi_dir_h]) for p in range(P))
    # feat head
    dz_f = tuple(dfeat[p] * relu_mask(feat_p[p]) for p in range(P))
    acc(dmats[mi_feat], psum([matT(a_last_p[p], dz_f[p]) for p in range(P)]))
    acc(dbs[li], psum([jnp.sum(dz_f[p], axis=0) for p in range(P)]))
    # alpha head (linear, padded 4-wide weight)
    acc(dmats[mi_alpha], psum([matT(a_last_p[p], gs[p]) for p in range(P)]))
    acc(dbs[li + 1], psum([jnp.sum(gs[p][:, 3:4], axis=0) for p in range(P)]))
    da = tuple(
        matWT(dz_f[p], mats[mi_feat]) + matWT(gs[p], mats[mi_alpha])
        for p in range(P)
    )

    # trunk, reversed: layer i's relu mask comes from its OUTPUT, which is
    # the (post-relu) input saved for layer i+1 — or a_last for the last
    for i in reversed(range(num_trunk)):
        out_acts = tuple(
            trunk_inputs_p[p][i + 1] if i + 1 < num_trunk else a_last_p[p]
            for p in range(P)
        )
        dz = tuple(da[p] * relu_mask(out_acts[p]) for p in range(P))
        mi_i = trunk_mi[i]
        acc(dmats[mi_i],
            psum([matT(trunk_inputs_p[p][i], dz[p]) for p in range(P)]))
        if i in skip:
            acc(dmats[mi_i + 1],
                psum([matT(xyz_parts[p], dz[p]) for p in range(P)]))
        acc(dbs[1 + i], psum([jnp.sum(dz[p], axis=0) for p in range(P)]))
        da = tuple(matWT(dz[p], mats[mi_i]) for p in range(P))

    # layer1 (no activation)
    acc(dmats[mi_layer1],
        psum([matT(xyz_parts[p], da[p]) for p in range(P)]))
    acc(dbs[0], psum([jnp.sum(da[p], axis=0) for p in range(P)]))


def _make_bwd_kernel(model: FlexibleNeRFModel, compute_dtype, dw_dtype=None,
                     samples_per_ray: int = 0, _skip_dw: bool = False,
                     parts: int = 1):
    """Backward kernel: recompute + chain rule + grid-accumulated grads.

    Outputs mirror the split-matmul operand list (f32) + biases (f32).
    ``parts`` > 1 processes independent ray-parts with both the forward
    recompute and the delta chain interleaved (latency-bound MXU chains).
    """
    d = _dims(model)
    n_mats = _num_mats(model)
    n_b = len(_flex_param_layout(model))
    cd = compute_dtype

    n_bp = n_b + 1  # biases + the appended combined head bias (viewdirs)

    def kernel(*refs):
        # inputs: pts, dirs, g, mats..., biases...
        # outputs: dmats..., dbs... (dbs only for the n_b REAL biases)
        pts_ref, dirs_ref, g_ref = refs[0], refs[1], refs[2]
        mats = refs[3 : 3 + n_mats]
        biases = refs[3 + n_mats : 3 + n_mats + n_bp]
        dmats = refs[3 + n_mats + n_bp : 3 + 2 * n_mats + n_bp]
        dbs = refs[3 + 2 * n_mats + n_bp :]

        B = pts_ref.shape[0]
        P = parts
        Bp = B // P
        xyz_p = tuple(
            _pe_in_kernel(
                pts_ref[p * Bp:(p + 1) * Bp, :],
                model.num_encoding_fn_xyz, model.include_input_xyz,
                d.pad_xyz,
            )
            for p in range(P)
        )
        if samples_per_ray:
            # per-ray dirs input expanded to samples (see _make_fwd_kernel)
            R = dirs_ref.shape[0]
            Rp = R // P
            dir_p = tuple(
                _expand_rows(
                    _pe_in_kernel(
                        dirs_ref[p * Rp:(p + 1) * Rp, :],
                        model.num_encoding_fn_dir,
                        model.include_input_dir, d.pad_dir,
                    ),
                    samples_per_ray, Bp,
                )
                for p in range(P)
            )
        else:
            dir_p = tuple(
                _pe_in_kernel(
                    dirs_ref[p * Bp:(p + 1) * Bp, :],
                    model.num_encoding_fn_dir, model.include_input_dir,
                    d.pad_dir,
                )
                for p in range(P)
            )

        _, saveds = _forward_block_parts(
            model, mats, biases, xyz_p, dir_p, cd, keep_activations=True
        )

        gs = tuple(
            g_ref[p * Bp:(p + 1) * Bp, :] for p in range(P)
        )  # [Bp, 4] f32
        _backward_chain_parts(
            model, cd, dw_dtype, mats, dmats, dbs, saveds,
            xyz_p, dir_p, gs, _skip_dw=_skip_dw,
        )

    return kernel


def _assemble_grads(model: FlexibleNeRFModel, dmats, dbs):
    """Split-matmul grads -> flax param-tree grads (unpad + re-concat)."""
    names = _flex_param_layout(model)
    d = _dims(model)
    skip = set(_skip_indices(model))
    num_trunk = model.num_layers - 1
    tree = {}
    tree[names[0]] = {
        "kernel": dmats[0][: d.dim_xyz], "bias": dbs[0]
    }
    mi = 1
    for i in range(num_trunk):
        if i in skip:
            dk = jnp.concatenate(
                [dmats[mi], dmats[mi + 1][: d.dim_xyz]], axis=0
            )
            mi += 2
        else:
            dk = dmats[mi]
            mi += 1
        tree[names[1 + i]] = {"kernel": dk, "bias": dbs[1 + i]}
    li = model.num_layers
    tree[names[li]] = {"kernel": dmats[mi], "bias": dbs[li]}  # feat
    # padded 4-wide head dW: alpha lives in column 3, rgb in 0-2
    tree[names[li + 1]] = {
        "kernel": dmats[mi + 1][:, 3:4], "bias": dbs[li + 1]
    }  # alpha
    dk_dir = jnp.concatenate(
        [dmats[mi + 2], dmats[mi + 3][: d.dim_dir]], axis=0
    )
    tree[names[li + 2]] = {"kernel": dk_dir, "bias": dbs[li + 2]}
    tree[names[li + 3]] = {
        "kernel": dmats[mi + 4][:, :3], "bias": dbs[li + 3]
    }
    return {"params": tree}


def make_fused_flexible_field_train(
    model: FlexibleNeRFModel,
    *,
    block_samples: int = 2048,
    block_samples_bwd: int = None,
    compute_dtype=jnp.float32,
    dw_dtype=None,
    interpret: bool = False,
    _skip_dw: bool = False,
) -> FieldFn:
    """Fused field with custom VJP for the training hot path.

    Requires ``use_viewdirs=True`` (every shipped config). See the module
    docstring for the zero-input-cotangent contract.

    ``compute_dtype`` sets the matmul OPERAND dtype (the chain is always
    f32 — the round-1 bf16 where/astype chains crashed Mosaic; casting only
    dot operands is both the fix and where the MXU rate is). ``dw_dtype``
    separately controls the dW contraction operands (default f32, the
    historically-safe form). ``block_samples_bwd`` defaults to
    ``min(block_samples, 1024)`` — the bwd kernel keeps ~16 activation
    blocks live in VMEM, so it needs smaller blocks than the forward.
    """
    if not model.use_viewdirs:
        raise NotImplementedError(
            "fused training field currently requires use_viewdirs=True"
        )
    if block_samples_bwd is None:
        block_samples_bwd = min(block_samples, 1024)
    fwd_field = make_fused_flexible_field(
        model,
        block_samples=block_samples,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )
    bwd_kernels = {}

    def get_bwd_kernel(samples_per_ray: int, parts: int = 1):
        k = (samples_per_ray, parts)
        if k not in bwd_kernels:
            bwd_kernels[k] = _make_bwd_kernel(
                model, compute_dtype, dw_dtype=dw_dtype,
                samples_per_ray=samples_per_ray, _skip_dw=_skip_dw,
                parts=parts,
            )
        return bwd_kernels[k]

    names = _flex_param_layout(model)

    def _bwd_kernel_call(mats, bs, pts, viewdirs, g_flat):
        N, S, _ = pts.shape
        total = N * S
        pts_flat = pts.reshape(total, 3)
        block, pad, rays_per_block = _ray_blocking(block_samples_bwd, N, S)
        if pad:
            pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
            g_flat = jnp.pad(g_flat, ((0, pad), (0, 0)))
        n_ray_pad = (total + pad) // S
        dirs_in = jnp.pad(viewdirs, ((0, n_ray_pad - N), (0, 0)))
        padded = total + pad
        grid = (padded // block,)
        bwd_kernel = get_bwd_kernel(S, _field_parts(rays_per_block, S))

        sample_spec = pl.BlockSpec(
            (block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        dir_spec = pl.BlockSpec(
            (rays_per_block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        g_spec = pl.BlockSpec(
            (block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

        def full2d(arrs):
            return [
                pl.BlockSpec(
                    a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                )
                for a in arrs
            ]

        b_specs = [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs
        ]
        # bias grads only for the REAL parameters (the appended combined
        # head bias is a derived constant, split_flex_params)
        bs_real = bs[: len(names)]
        out_shapes = [
            jax.ShapeDtypeStruct(m.shape, jnp.float32) for m in mats
        ] + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_real]
        out_specs = full2d(mats) + [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs_real
        ]
        grads = pl.pallas_call(
            bwd_kernel,
            out_shape=tuple(out_shapes),
            grid=grid,
            in_specs=[sample_spec, dir_spec, g_spec]
            + full2d(mats)
            + b_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
            # interleaved parts keep every part's recompute live; the
            # 16 MB scoped-VMEM budget is a compiler default, not hardware
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(pts_flat, dirs_in, g_flat, *mats, *bs)
        return grads[: len(mats)], grads[len(mats) :]

    @jax.custom_vjp
    def apply(params, pts, viewdirs):
        return fwd_field(params, pts, viewdirs)

    def apply_fwd(params, pts, viewdirs):
        return fwd_field(params, pts, viewdirs), (params, pts, viewdirs)

    def apply_bwd(res, g):
        params, pts, viewdirs = res
        N, S, _ = pts.shape
        total = N * S
        mats, bs = split_flex_params(model, params, compute_dtype)
        g_flat = g.reshape(total, 4).astype(jnp.float32)
        dmats, dbs = _bwd_kernel_call(mats, bs, pts, viewdirs, g_flat)
        tree = _assemble_grads(model, dmats, dbs)
        # zero cotangents for pts/viewdirs (see module docstring contract)
        return tree, jnp.zeros_like(pts), jnp.zeros_like(viewdirs)

    apply.defvjp(apply_fwd, apply_bwd)

    def field(params, pts, viewdirs):
        # The zero-input-cotangent contract (module docstring) made
        # explicit: stop_gradient lets XLA dead-code-eliminate the
        # [N, S, 3] zero cotangents the VJP must structurally return
        # (they showed up as ~1.2 ms/step of broadcast materializations
        # in the trace).
        return apply(
            params,
            jax.lax.stop_gradient(pts),
            jax.lax.stop_gradient(viewdirs),
        )

    return field
