"""Fully fused render: PE -> MLP -> alpha-compositing in ONE Pallas kernel.

Completes the north-star fusion (SURVEY.md §7.9: "PE → MLP → compositing so
samples never round-trip to HBM"): where ``fused_mlp`` stops at the raw
[B, 4] field, this kernel composites per-ray inside VMEM and writes only
the per-RAY outputs (rgb/disparity/accumulation/depth, the per-sample
weights for hierarchical sampling, and the Dex-NeRF σ-threshold depths).

Compositing the reference way (``volume_rendering_utils.py:6-70``) needs an
exclusive cumprod along each ray's samples. The σ chain runs in DENSE
[R, S] rays-x-samples tiles (per-sample [B, 1] columns waste 128x lanes on
TPU — see ``_rs_ops``), and the scans are [S, S] lane MATMULS with
iota-built masks — the MXU-native form:

* exclusive cumprod:  ``T = exp( log(1 - alpha + eps) @ U )`` with
  ``U[j, s] = (j < s)``;
* per-ray reductions are lane rowsums; only the rgb accumulation uses the
  ray-group indicator ``G[g, c] = (c // S == g)``;
* σ-threshold FIRST crossing: hit count ``ind @ U + ind == 1`` picks the
  first hit as a one-hot, so the Dex depth is ``rowsum(first * z)``, with
  the reference's no-hit fallback (argmax of all-zeros -> sample 0).

Stage-1 scope: forward (no-grad) path — validation/eval rendering; training
keeps the ``fused_mlp_train`` field + XLA compositing. σ-noise is not
supported here (validation runs noise-free; the reference's eval path too).

Numerics: the whole compositing chain is float32 (mask matmuls are tiny);
the MLP follows the fused_mlp dtype discipline (bf16 operands, f32 chain).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexnerf_tpu.core.volrend import VolumeRenderOutputs
from dexnerf_tpu.models.mlp import FlexibleNeRFModel
from dexnerf_tpu.ops.fused_mlp import (
    _coord_dot,
    _dims,
    _expand_rows,
    _forward_block_parts,
    _num_biases,
    _num_mats,
    _pe_in_kernel,
    _ray_blocking,
    split_flex_params,
)


def _f32dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _rs_ops(B: int, S: int):
    """Rays-x-samples layout toolkit for one block of B = R*S samples.

    Per-sample [B, 1] columns are maximally lane-wasteful on TPU (a [B, 1]
    f32 tile occupies B x 128 lanes with one useful lane), so compositing
    chains run in dense [R, S] tiles instead. Mosaic cannot shape-cast
    [B, 1] <-> [R, S], so the layout change is itself a selector matmul.
    Returns ``(G, expand, to_rs, from_rs, lane_sel)``: the [R, B]
    ray-group indicator (per-ray reductions via dim-1, row expansion via
    dim-0 contraction), the three layout mappers, and the [B, S]
    sample-lane selector (row b's useful lane is b % S) — exposed so
    callers building their own packing dots share ONE definition of the
    rays-x-samples lane convention. All masks are iota-built (Pallas
    kernels cannot capture array constants).
    """
    R = B // S
    g = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (R, B), 1)
    G = jnp.where(gc // S == g, 1.0, 0.0)
    b_i = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    lane_sel = jnp.where(b_i % S == s_i, 1.0, 0.0)  # [B, S]

    def expand(x, exact=False):  # [R, D] -> [B, D]: row b = x[b // S]
        # exact=True uses the 2-pass hi/lo split dot — Mosaic's default f32
        # dot truncates operands to bf16, which is fine for the σ/weight
        # chains but NOT for values feeding the positional encoding
        # (coordinates; the top frequency amplifies a 2^-9 relative error
        # into an O(1) sin phase error). See fused_mlp._coord_dot.
        dims = (((0,), (0,)), ((), ()))
        if exact:
            return _coord_dot(x, G, dims, x_operand=1)
        return jax.lax.dot_general(
            G, x, dims, preferred_element_type=jnp.float32
        )

    def to_rs(v, exact=False):  # [B, 1] -> [R, S]
        # exact=True routes the VALUE operand through the 2-pass hi/lo
        # split: the default Mosaic dot truncates it to bf16 (~2^-9
        # relative), which can flip near-threshold Dex-depth compares
        # (sigma > m) vs the XLA compositor. G/lane_sel are 0/1 (exact).
        if exact:
            return _coord_dot(
                v * lane_sel, G, (((1,), (0,)), ((), ())), x_operand=1
            )
        return _f32dot(G, v * lane_sel)

    def from_rs(x, exact=False):  # [R, S] -> [B, 1]
        return jnp.sum(expand(x, exact) * lane_sel, axis=1, keepdims=True)

    return G, expand, to_rs, from_rs, lane_sel


def _make_render_kernel(
    model: FlexibleNeRFModel,
    compute_dtype,
    samples_per_ray: int,
    thresholds: Tuple[float, ...],
    white_background: bool,
    parts: int = 1,
):
    d = _dims(model)
    n_mats = _num_mats(model)
    n_b = _num_biases(model)
    S = samples_per_ray
    T = len(thresholds)

    def kernel(*refs):
        orig_ref, rdir_ref, dirs_ref = refs[0], refs[1], refs[2]
        z_ref, dists_ref = refs[3], refs[4]
        mats = refs[5 : 5 + n_mats]
        biases = refs[5 + n_mats : 5 + n_mats + n_b]
        outs = refs[5 + n_mats + n_b :]
        out_rgb, out_disp, out_acc, out_depth, out_w = outs[:5]
        R = dists_ref.shape[0]
        P = parts
        Rp = R // P
        Bp = Rp * S

        # P independent ray-parts with the MLP ops interleaved — the layer
        # chain is latency-bound on the MXU (~65% MFU single-chain, ~99%
        # interleaved; docs/PERF_NOTES.md "interleave"). Masks are built
        # once for the part size and shared.
        G, expand, to_rs, from_rs, _ = _rs_ops(Bp, S)

        def rows(ref, p):
            return ref[p * Rp:(p + 1) * Rp, :]

        # Sample positions are computed IN-KERNEL from per-ray origins/
        # directions and the dense [Rp, S] z tiles — the XLA-side
        # pts = o + d*z materializes [N, S, 3] arrays whose minor dim of 3
        # pads to 128 lanes (the same ~16%-of-step cost found on the train
        # path, docs/PERF_NOTES.md "in-kernel pts"). exact=True: coordinate
        # values must not ride bf16-truncating dots.
        pts_p = tuple(
            expand(rows(orig_ref, p), exact=True)
            + expand(rows(rdir_ref, p), exact=True)
            * from_rs(rows(z_ref, p), exact=True)
            for p in range(P)
        )
        xyz_p = tuple(
            _pe_in_kernel(
                pts, model.num_encoding_fn_xyz, model.include_input_xyz,
                d.pad_xyz,
            )
            for pts in pts_p
        )
        dir_p = tuple(
            _expand_rows(
                _pe_in_kernel(
                    rows(dirs_ref, p), model.num_encoding_fn_dir,
                    model.include_input_dir, d.pad_dir,
                ),
                S, Bp,
            )
            for p in range(P)
        )
        raws, _ = _forward_block_parts(
            model, mats, biases, xyz_p, dir_p, compute_dtype,
        )

        # compositing (reference volume_rendering_utils.py:29-49), f32,
        # in dense rays-x-samples tiles (see _rs_ops: [B, 1] columns are
        # 128x lane-wasteful); z/dists arrive [R, S] from the wrapper
        col4 = jax.lax.broadcasted_iota(jnp.int32, (Bp, 4), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        colT = (
            jax.lax.broadcasted_iota(jnp.int32, (Rp, T), 1) if T else None
        )
        for p in range(P):
            raw = raws[p]
            sl = slice(p * Rp, (p + 1) * Rp)
            rgb = jax.nn.sigmoid(raw) * jnp.where(col4 < 3, 1.0, 0.0)
            sigma = jnp.maximum(to_rs(raw[:, 3:4], exact=True), 0.0)  # [Rp, S]
            z = rows(z_ref, p)  # [Rp, S]
            alpha = 1.0 - jnp.exp(-sigma * rows(dists_ref, p))
            # exclusive cumsum along samples as an [S, S] lane matmul.
            # reference guard is (1 - alpha + 1e-10); the outer max defends
            # against the compiler reassociating (1.0 + 1e-10) - alpha (the
            # eps rounds away and alpha == 1 would give log(0))
            log_t = jnp.log(jnp.maximum((1.0 - alpha) + 1e-10, 1e-10))
            # tolerance note: this dot truncates log_t to bf16 (~2^-9
            # relative in the LOG), so transmittance carries up to
            # ~|log_t|*2^-9 relative error vs the XLA cumprod — measured
            # end-to-end well under the 1e-3 image tolerance (chip parity,
            # docs/KERNELS.md); sigma/coordinates stay exact (above)
            trans = jnp.exp(_f32dot(log_t, jnp.where(rr < cc, 1.0, 0.0)))
            w_rs = alpha * trans  # [Rp, S]
            out_w[sl, :] = w_rs

            rgb_map = _f32dot(G, from_rs(w_rs) * rgb)[:, 0:3]  # [Rp, 3]
            depth = jnp.sum(w_rs * z, axis=1, keepdims=True)  # [Rp, 1]
            acc = jnp.sum(w_rs, axis=1, keepdims=True)  # [Rp, 1]
            if white_background:
                rgb_map = rgb_map + (1.0 - acc)
            out_rgb[sl, :] = rgb_map
            out_depth[sl, :] = depth
            out_acc[sl, :] = acc
            out_disp[sl, :] = 1.0 / jnp.maximum(
                1e-10, depth / jnp.maximum(acc, 1e-37)
            )

            if T:
                out_dex = outs[5]
                dex = jnp.zeros((Rp, T), jnp.float32)
                z_first = z[:, :1]  # no-hit fallback: reference argmax of
                # all-zeros -> sample 0 (the nearest z)
                for i, m in enumerate(thresholds):
                    ind = jnp.where(sigma > np.float32(m), 1.0, 0.0)
                    hits_before = _f32dot(
                        ind, jnp.where(rr < cc, 1.0, 0.0)
                    )
                    first = jnp.where(
                        jnp.logical_and(hits_before < 0.5, ind > 0.5),
                        1.0, 0.0,
                    )
                    ddex = jnp.sum(first * z, axis=1, keepdims=True)
                    any_hit = jnp.sum(ind, axis=1, keepdims=True)
                    val = jnp.where(any_hit > 0.5, ddex, z_first)
                    dex = jnp.where(colT == i, val, dex)
                out_dex[sl, :] = dex

    return kernel


def make_fused_render(
    model: FlexibleNeRFModel,
    *,
    block_samples: int = 1024,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Returns render(params, origins[N,3], directions[N,3], viewdirs[N,3],
    z_vals[N,S], dists[N,S], thresholds, white_background) ->
    VolumeRenderOutputs with [N]-shaped maps — sample positions ``o + d*z``
    are computed in-kernel from the per-ray inputs (no [N, S, 3] HBM
    intermediates). Deterministic (no σ-noise) — the validation/eval path.
    """
    if not model.use_viewdirs:
        raise NotImplementedError("fused render requires use_viewdirs=True")
    kernels = {}

    def render(params, origins, directions, viewdirs, z_vals, dists, *,
               thresholds=(), white_background=False):
        N, S = z_vals.shape
        total = N * S
        T = len(thresholds)

        # shared blocking rule (multiple-of-8 ray blocks when grid > 1 —
        # Mosaic sublane constraint; e.g. S=192 configs)
        block, pad, rays_per_block = _ray_blocking(block_samples, N, S)
        n_ray_pad = (total + pad) // S
        # the most interleaved ray-parts whose [Rp, S] tiles keep >= 8
        # sublane rows (see the kernel comment / PERF_NOTES "interleave")
        n_parts = 1
        for cand in (8, 4, 2):
            if rays_per_block % cand == 0 and rays_per_block // cand >= 8:
                n_parts = cand
                break

        def pad_rays(a):
            return jnp.pad(a, ((0, n_ray_pad - N), (0, 0)))

        # origins/directions stream PER-RAY; z/dists in rays-x-samples
        # layout (dense tiles in-kernel); pts = o + d*z is computed
        # in-kernel (see kernel comment)
        orig_in = pad_rays(origins)
        rdir_in = pad_rays(directions)
        dirs_in = pad_rays(viewdirs)
        z_rows = pad_rays(z_vals)
        d_rows = pad_rays(dists)

        key = (S, tuple(thresholds), bool(white_background), n_parts)
        if key not in kernels:
            kernels[key] = _make_render_kernel(
                model, compute_dtype, S, tuple(thresholds),
                bool(white_background), parts=n_parts,
            )
        kernel = kernels[key]

        mats, bs = split_flex_params(model, params, compute_dtype)
        padded = total + pad
        grid = (padded // block,)
        R = rays_per_block

        def blk(shape2):
            return pl.BlockSpec(
                shape2, lambda i: (i, 0), memory_space=pltpu.VMEM
            )

        in_specs = [blk((R, 3)), blk((R, 3)), blk((R, 3)),
                    blk((R, S)), blk((R, S))]
        in_specs += [
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for m in mats
        ]
        in_specs += [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((n_ray_pad, 3), jnp.float32),  # rgb
            jax.ShapeDtypeStruct((n_ray_pad, 1), jnp.float32),  # disparity
            jax.ShapeDtypeStruct((n_ray_pad, 1), jnp.float32),  # acc
            jax.ShapeDtypeStruct((n_ray_pad, 1), jnp.float32),  # depth
            jax.ShapeDtypeStruct((n_ray_pad, S), jnp.float32),  # weights
        ]
        out_specs = [blk((R, 3)), blk((R, 1)), blk((R, 1)), blk((R, 1)),
                     blk((R, S))]
        if T:
            out_shapes.append(jax.ShapeDtypeStruct((n_ray_pad, T), jnp.float32))
            out_specs.append(blk((R, T)))

        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
            # big interleaved blocks hold all parts' encodings/activations
            # live; the 16 MB scoped-VMEM budget is a compiler DEFAULT,
            # not hardware (v5e has 128 MB) — same raise as the combined
            # loss kernel (docs/PERF_NOTES.md)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(orig_in, rdir_in, dirs_in, z_rows, d_rows, *mats, *bs)

        rgb, disp, acc, depth, w = outs[:5]
        return VolumeRenderOutputs(
            rgb=rgb[:N],
            disparity=disp[:N, 0],
            accumulation=acc[:N, 0],
            weights=w[:N],
            depth=depth[:N, 0],
            depth_dex=(
                jnp.moveaxis(outs[5][:N], -1, 0) if T else None
            ),
        )

    return render


def make_fused_render_rays(
    coarse_model: FlexibleNeRFModel,
    fine_model: Optional[FlexibleNeRFModel],
    settings,
    *,
    block_samples: int = 1024,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Deterministic coarse->fine renderer over one ray block, with BOTH
    field evaluation AND compositing inside the Pallas kernels.

    Drop-in for ``renderer.render_rays`` on the validation/eval path
    (``render_image(..., rays_impl=...)``): stratified depths and the
    inverse-CDF resampling stay XLA (cheap, [N, S]-sized); everything
    sample-major runs fused. σ-noise/perturb are unsupported (eval variant).
    """
    from dexnerf_tpu.core.sampling import hierarchical_z_vals, stratified_z_vals
    from dexnerf_tpu.core.volrend import ray_dists
    from dexnerf_tpu.render.renderer import RenderResult

    s = settings.eval_variant()
    rc = make_fused_render(
        coarse_model, block_samples=block_samples,
        compute_dtype=compute_dtype, interpret=interpret,
    )
    rf = (
        make_fused_render(
            fine_model, block_samples=block_samples,
            compute_dtype=compute_dtype, interpret=interpret,
        )
        if fine_model is not None
        else None
    )

    def render(params, rays, key=None):
        viewdirs = rays.viewdirs
        z_vals = stratified_z_vals(
            rays.near, rays.far, s.num_coarse, lindisp=s.lindisp
        )
        coarse = rc(
            params["coarse"], rays.origins, rays.directions, viewdirs,
            z_vals, ray_dists(z_vals, rays.directions),
            thresholds=(), white_background=s.white_background,
        )
        fine = None
        if rf is not None and s.num_fine > 0:
            z_merged, _ = hierarchical_z_vals(
                None, z_vals, coarse.weights, s.num_fine, det=True
            )
            fine = rf(
                params["fine"], rays.origins, rays.directions, viewdirs,
                z_merged, ray_dists(z_merged, rays.directions),
                thresholds=tuple(s.m_thres_cand),
                white_background=s.white_background,
            )
        return RenderResult(coarse=coarse, fine=fine)

    return render
