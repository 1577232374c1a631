"""Whole-pass fused training loss: PE → MLP → compositing → MSE **and all
parameter gradients** in ONE Pallas kernel per render pass.

Why: the round-2 fused train step (``fused_mlp_train``) splits each pass into
a forward kernel and a backward kernel; the backward must RECOMPUTE the whole
forward in VMEM because saving per-sample activations to HBM would cost more
than the recompute (docs/PERF_NOTES.md). But the photometric loss is a sum of
per-ray terms (``train_nerf_rgb.py:262-278``), so its cotangent is computable
per ray-block with no global information — which means the forward and
backward can live in the SAME kernel program, with the forward activations
still resident in VMEM when the backward chain runs. One kernel per pass does

  positional encoding → MLP (activations kept in VMEM) → alpha compositing →
  per-ray squared error → compositing backward → MLP backward → dW/db
  accumulation across grid steps

and the forward is computed exactly ONCE per step instead of twice. The raw
[B, 4] field, the per-sample cotangent, and every activation never touch HBM.

Integration contract (mirrors the zero-cotangent contract of
``fused_mlp_train``): gradients are computed ONLY for the model parameters.
This is exact in the NeRF training graph — coarse z-values come from the
parameter-free stratified sampler, fine z-values are ``stop_gradient``-ed
(reference ``train_utils.py:170``, ours ``core/sampling.py``), and the
coarse→fine weight dependence is severed by the same stop_gradient — so no
gradient flows through pts/dirs/dists/targets. The loss value is returned
through a ``jax.custom_vjp`` whose backward simply scales the
kernel-computed gradient tree by the incoming loss cotangent, so
``jax.value_and_grad`` over the train step keeps working unchanged.

Compositing math is value-equivalent to the fused render kernel
(``fused_render``) but the segmented scans use a cheaper layout: the [B, 1]
per-sample columns are mapped to rays x samples via selector MATMULS (Mosaic
cannot shape-cast [B, 1] <-> [R, S]) so the exclusive cumprod and the
backward's suffix sum become [S, S] lane matmuls — the [B, B] strict-lower
mask of fused_render costs 4 MB of VMEM at block 1024, which alone blew this
kernel's scoped-VMEM budget. The backward matches autodiff through the
reference's guarded cumprod: ``-suffix / (1 - alpha + 1e-10)``, which stays
finite AND non-zero at saturated samples (see the in-kernel comment — a
zeroing guard measurably hurts late training).
σ-noise is injected from a PRE-GENERATED normal input (XLA generates it with
the same ``jax.random`` key stream as the XLA path, so trajectories match).

Reference semantics: ``volume_rendering_utils.py:6-70`` (compositing),
``train_nerf_rgb.py:262-278`` (RGB MSE), ``train_nerf_ir.py:260-263``
(Rec.601 luminance MSE).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexnerf_tpu.models.mlp import FlexibleNeRFModel
from dexnerf_tpu.ops.fused_mlp import (
    _coord_dot,
    _dims,
    _expand_rows,
    _flex_param_layout,
    _forward_block_parts,
    _num_mats,
    _pe_in_kernel,
    split_flex_params,
)
from dexnerf_tpu.ops.fused_mlp_train import (
    _assemble_grads,
    _backward_chain_parts,
)
from dexnerf_tpu.ops.fused_render import _f32dot, _rs_ops

# Rec.601 luma weights (reference train_nerf_ir.py:260-263), single-sourced
# from core.metrics (leaf module — no facade cycle).
from dexnerf_tpu.core.metrics import LUMA_WEIGHTS as _LUMA


def _loss_ray_blocking(block_samples: int, N: int, S: int):
    """(block, pad, rays_per_block) — like ``fused_mlp._ray_blocking`` but
    with the Mosaic sublane floor on the per-RAY blocks: this kernel has
    [R, 4]/[R, 1] outputs, whose leading block dim must be a multiple of 8
    (or the full array). So R >= 8 when N >= 8, else one full-array block."""
    if N < 8:
        return N * S, 0, N
    rays_per_block = max(8, min(block_samples // S, N))
    if rays_per_block < N:
        # blocked (grid > 1): the [R, 4]/[R, 1] output block's leading dim
        # must be a multiple of 8 (Mosaic block-dim constraint); a user-set
        # block_samples that is not a multiple of 8*S would otherwise fail
        # to compile (ADVICE r2)
        rays_per_block = max(8, (rays_per_block // 8) * 8)
    block = rays_per_block * S
    pad = (-N * S) % block
    return block, pad, rays_per_block


def _make_loss_kernel(
    model: FlexibleNeRFModel,
    compute_dtype,
    dw_dtype,
    samples_per_ray: int,
    white_background: bool,
    supervision: str,
    has_noise: bool,
    parts: int = 1,
    ablate: Optional[str] = None,
    has_depth: bool = False,
):
    """``ablate`` is a TIMING-ONLY bisection knob
    (tools/loss_kernel_ablation.py): "no_bwd" skips the backward chain,
    "no_comp" additionally skips compositing (loss = sum of raw),
    "no_save" = no_comp without saving activations, "mlp_only"
    additionally replaces coordinate prep + PE with an iota input,
    "cheap_coords" keeps everything but drops the 2-pass exact
    coordinate dots. Outputs are numerically WRONG in every mode but
    ``None``."""
    d = _dims(model)
    n_mats = _num_mats(model)
    n_bp = len(_flex_param_layout(model)) + 1  # + combined head bias
    S = samples_per_ray

    def kernel(*refs):
        # inputs: origins, raydirs, z, viewdirs, dists, [noise],
        #         [depth_gt [R, 1], depth_coef [R, 1]],
        #         target_pk [Rp, 4P], valid_pk [Rp, 4P], bias_pk [1, 4P],
        #         mats..., biases...
        # outputs: loss(1,1) acc, w [R,S], rgb [R,4], dmats... acc, dbs... acc
        orig_ref, rdir_ref, z_ref = refs[0], refs[1], refs[2]
        dirs_ref, dists_ref = refs[3], refs[4]
        i = 5
        noise_ref = None
        if has_noise:
            noise_ref = refs[i]
            i += 1
        dgt_ref = dcoef_ref = None
        if has_depth:
            dgt_ref, dcoef_ref = refs[i], refs[i + 1]
            i += 2
        target_ref, valid_ref, bias_pk_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        mats = refs[i : i + n_mats]
        biases = refs[i + n_mats : i + n_mats + n_bp]
        i += n_mats + n_bp
        out_loss, out_w, out_rgb = refs[i], refs[i + 1], refs[i + 2]
        dmats = refs[i + 3 : i + 3 + n_mats]
        dbs = refs[i + 3 + n_mats :]

        R = dists_ref.shape[0]
        P = parts
        Rp = R // P
        Bp = Rp * S

        # ray-group indicator + [Bp,1] <-> [Rp,S] layout mappers for ONE
        # row-part (shared across parts — see fused_render._rs_ops). The
        # block is processed as P independent ray-parts with the MLP ops
        # INTERLEAVED across parts: the layer chain is latency-bound on
        # the MXU (~65% MFU single-chain, ~99% with two interleaved
        # chains — docs/PERF_NOTES.md "interleave experiment").
        G, expand, to_rs, from_rs, lane_sel = _rs_ops(Bp, S)

        def rows(ref, p):
            return ref[p * Rp:(p + 1) * Rp, :]

        # Sample positions are computed IN-KERNEL from per-ray origins/
        # directions and a flat per-sample z column: the XLA-side
        # pts = o + d*z materialized [N, S, 3] arrays whose minor dim of 3
        # pads to 128 lanes — the profiler showed ~3 ms/step (16%) going to
        # those broadcasts + multiply-adds alone (docs/PERF_NOTES.md).
        # exact=True: coordinates must not ride bf16-truncating dots (see
        # _rs_ops); these selection matmuls are <5% of block FLOPs.
        # Round-3 negative results (measured, don't retry): streaming z as
        # a pre-flattened [B, 1] column (+0.9 ms/step vs the from_rs dot)
        # and a combined [R, 6] o|d input with in-kernel lane slices
        # (+1.5 ms) — the structural dots ride the MXU and overlap the VPU
        # chain, so they are cheaper than padded-column DMAs or lane-slice
        # relayouts.
        exact = ablate not in ("cheap_coords",)
        if ablate == "mlp_only":
            fake = (
                jax.lax.broadcasted_iota(jnp.int32, (Bp, d.pad_xyz), 1)
                .astype(jnp.float32)
                * 1e-3
            )
            xyz_p = tuple(fake + float(p) for p in range(P))
        else:
            pts_p = tuple(
                expand(rows(orig_ref, p), exact=exact)
                + expand(rows(rdir_ref, p), exact=exact)
                * from_rs(rows(z_ref, p), exact=exact)
                for p in range(P)
            )
            xyz_p = tuple(
                _pe_in_kernel(
                    pts, model.num_encoding_fn_xyz, model.include_input_xyz,
                    d.pad_xyz, exact=exact,
                    _skip_sin=ablate == "no_sin",
                )
                for pts in pts_p
            )
        dir_p = tuple(
            _expand_rows(
                _pe_in_kernel(
                    rows(dirs_ref, p), model.num_encoding_fn_dir,
                    model.include_input_dir, d.pad_dir, exact=exact,
                ),
                S, Bp,
            )
            for p in range(P)
        )
        raws, saveds = _forward_block_parts(
            model, mats, biases, xyz_p, dir_p, compute_dtype,
            keep_activations=ablate not in ("no_save",),
            pack_rgb_head=True,
        )
        raw_pk, alpha4s = raws
        Q = 4 * P

        # ---- compositing: σ chain per part in dense [Rp, S] tiles, the
        # rgb chain ONCE on a lane-PACKED [Bp, 4P] tile ----
        # Per-sample [B, 1] columns (and [B, 4] rgb tiles) are maximally
        # lane-wasteful on TPU: a [B, 4] f32 tile occupies B x 128 lanes
        # with 4 useful, so P per-part rgb chains pay the full-vreg cost P
        # times. The forward therefore emits the rgb head PACKED — part
        # p's rgb in lanes 4p..4p+2 of one [Bp, 4P] tile (fused_mlp
        # pack_rgb_head) — and the whole sigmoid/loss/backward rgb chain
        # runs once. The σ chain (noise, relu, alpha, log/exp scans,
        # weights, and its backward) runs per part in DENSE [Rp, S] tiles
        # as before (σ converts via selector matmuls — Mosaic cannot
        # shape-cast [B, 1] <-> [R, S]); segmented scans are [S, S] lane
        # matmuls. Per-part [Bp, 4] cotangents are unpacked with exact
        # 2-pass dots only at the backward-chain boundary.
        rr = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        lq = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)  # lane pattern
        mask_rgb_pk = jnp.where(lq % 4 < 3, 1.0, 0.0)  # [1, Q] rgb lanes
        # lane_sel (the _rs_ops from_rs interior) is shared by the
        # w/gsigma lane-packing dots below
        cSQ = jax.lax.broadcasted_iota(jnp.int32, (S, Q), 1)
        rQ4 = jax.lax.broadcasted_iota(jnp.int32, (Q, 4), 0)
        cQ4 = jax.lax.broadcasted_iota(jnp.int32, (Q, 4), 1)
        rQP = jax.lax.broadcasted_iota(jnp.int32, (Q, P), 0)
        cQP = jax.lax.broadcasted_iota(jnp.int32, (Q, P), 1)
        group4 = jnp.where(rQP // 4 == cQP, 1.0, 0.0)  # [Q, P] lane->part
        rP1 = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        # part p's [Q, 4] unpack selector (packed lanes 4p..4p+3 -> cols
        # 0..3) — one definition for out_rgb and the gs cotangent unpack
        un_mats = [
            jnp.where(rQ4 - 4 * p == cQ4, 1.0, 0.0) for p in range(P)
        ]

        if ablate in ("no_comp", "no_save", "mlp_only", "no_sin"):
            # timing only: loss = sum of raw field values, no compositing
            loss_total = jnp.sum(raw_pk)
            for a4 in alpha4s:
                loss_total = loss_total + jnp.sum(a4)
            out_w[:] = jnp.zeros_like(out_w)
            out_rgb[:] = jnp.zeros_like(out_rgb)
            val = loss_total.reshape(1, 1)
            first = pl.program_id(0) == 0

            @pl.when(first)
            def _():
                out_loss[:] = val
                for r in (*dmats, *dbs):
                    r[...] = jnp.zeros_like(r)

            @pl.when(jnp.logical_not(first))
            def _():
                out_loss[:] = out_loss[:] + val

            return

        # head bias rides in packed [1, 4P] form from the wrapper (rgb_b
        # in lanes 4p..4p+2, alpha_b at 4p+3 — the alpha lanes of raw_pk
        # are zero and get masked after the sigmoid)
        bias_pk = bias_pk_ref[:]
        rgb4 = jax.nn.sigmoid(raw_pk + bias_pk) * mask_rgb_pk  # [Bp, Q]
        alpha_b = jnp.sum(bias_pk * jnp.where(lq == 3, 1.0, 0.0))

        # ---- σ forward per part ([Rp, S]) ----
        w_rs_l, one_m_l, trans_l, alpha_l, relu_l, dists_l = (
            [], [], [], [], [], []
        )
        for p in range(P):
            sigma_pre = to_rs(alpha4s[p][:, 3:4]) + alpha_b  # [Rp, S]
            if has_noise:
                sigma_pre = sigma_pre + rows(noise_ref, p)
            relu_mask = jnp.where(sigma_pre > 0, 1.0, 0.0)
            sigma = sigma_pre * relu_mask
            dists = rows(dists_ref, p)  # [Rp, S]
            alpha = 1.0 - jnp.exp(-sigma * dists)
            # the reference guard is (1 - alpha + 1e-10) INSIDE the product
            # — its derivative -1/(1-alpha+eps) keeps gradient flowing
            # through SATURATED samples (alpha == 1), where a
            # max(1-alpha, eps) guard would zero it (w_u ∝ eps cancels the
            # 1/eps, recovering the excluded-factor product). The outer max
            # only defends against the compiler reassociating
            # (1.0 + 1e-10) - alpha, where the eps rounds away and
            # alpha == 1 would give log(0).
            one_m = jnp.maximum((1.0 - alpha) + 1e-10, 1e-10)
            # exclusive cumsum along samples: j < s contributes to col s
            cum = _f32dot(jnp.log(one_m), jnp.where(rr < cc, 1.0, 0.0))
            trans = jnp.exp(cum)
            w_rs = alpha * trans  # [Rp, S]
            out_w[p * Rp:(p + 1) * Rp, :] = w_rs
            w_rs_l.append(w_rs)
            one_m_l.append(one_m)
            trans_l.append(trans)
            alpha_l.append(alpha)
            relu_l.append(relu_mask)
            dists_l.append(dists)

        # ---- packed rgb forward ----
        # w into the part's 4 lanes: route the from_rs interior through a
        # [S, Q] ones-spread dot instead of a lane reduce (same value
        # provenance: expand() already bf16-rounds w_rs, the 0/1 spread is
        # exact on the rounded values)
        w_pk = None
        for p in range(P):
            spread = jnp.where(cSQ // 4 == p, 1.0, 0.0)  # [S, Q]
            term = _f32dot(expand(w_rs_l[p]) * lane_sel, spread)
            w_pk = term if w_pk is None else w_pk + term
        wrgb = w_pk * rgb4
        ray_rgb = _f32dot(G, wrgb)  # [Rp, Q] (alpha lanes = 0)
        if white_background:
            lqr = jax.lax.broadcasted_iota(jnp.int32, (Rp, Q), 1)
            for p in range(P):
                acc_r = jnp.sum(w_rs_l[p], axis=1, keepdims=True)  # [Rp,1]
                maskp = jnp.where(
                    jnp.logical_and(lqr // 4 == p, lqr % 4 < 3), 1.0, 0.0
                )
                ray_rgb = ray_rgb + (1.0 - acc_r) * maskp
        for p in range(P):
            out_rgb[p * Rp:(p + 1) * Rp, :] = _coord_dot(
                ray_rgb, un_mats[p], (((1,), (0,)), ((), ()))
            )

        # ---- loss + ray cotangent on [Rp, Q] (UNNORMALIZED: the wrapper
        # divides by N*3 / N, and the custom-VJP backward folds the same
        # factor into its scale-by-cotangent multiply). valid_pk is 1 on
        # real rays' rgb lanes and 0 on padding AND on alpha lanes, so it
        # doubles as the rgb mask.
        diff = (ray_rgb - target_ref[:]) * valid_ref[:]  # [Rp, Q]
        if supervision == "luminance":
            luma_pk = jnp.zeros((1, Q), jnp.float32)
            for ci, lw in enumerate(_LUMA):
                luma_pk = jnp.where(lq % 4 == ci, jnp.float32(lw), luma_pk)
            # per-part luma sums: exact group contraction (loss path)
            dy = _coord_dot(
                diff * luma_pk, group4, (((1,), (0,)), ((), ()))
            )  # [Rp, P]
            loss_total = jnp.sum(dy * dy)
            g_ray = (
                2.0
                * _coord_dot(dy, group4, (((1,), (1,)), ((), ())))
                * luma_pk
            )  # [Rp, Q]
        else:
            loss_total = jnp.sum(diff * diff)
            g_ray = 2.0 * diff

        # ---- optional GT-depth term: coef_r * (Σ_s w_rs z_rs - gt_r)² ----
        # Per-ray [Rp, 1] column ops only (mirrors the white_background
        # acc_r pattern — a handful of column ops is fine; it is per-sample
        # CHAINS on [B, 1] columns that waste lanes). ``depth_coef`` arrives
        # premultiplied (weight * valid_mask / n_valid * norm) so the
        # wrapper's final /norm yields exactly the masked-MSE term, and
        # padding rays carry coef 0. All f32 VPU math — no truncating dots.
        gdep = []
        if has_depth:
            for p in range(P):
                z_rs = rows(z_ref, p)
                diff_d = (
                    jnp.sum(w_rs_l[p] * z_rs, axis=1, keepdims=True)
                    - rows(dgt_ref, p)
                )  # [Rp, 1]
                c = rows(dcoef_ref, p)  # [Rp, 1]
                loss_total = loss_total + jnp.sum(c * diff_d * diff_d)
                gdep.append(2.0 * c * diff_d)  # dL/d depth_r

        # ---- compositing backward: rgb packed, σ per part ----
        gr = expand(g_ray)  # [Bp, Q] per-sample ray cotangent
        # per-part sum over the ray's rgb channels (alpha lanes are 0)
        sums = _f32dot(gr * rgb4, group4)  # [Bp, P]
        if white_background:
            gwb = _f32dot(g_ray, group4)  # [Rp, P] dL/dacc per part
        gsig_pk = None
        for p in range(P):
            onehot = jnp.where(rP1 == p, 1.0, 0.0)  # [P, 1]
            gw = to_rs(_f32dot(sums, onehot))  # [Rp, S]
            if white_background:
                # dL/dacc broadcasts across the ray's samples
                gw = gw - _f32dot(gwb, onehot)
            if has_depth:
                # d depth_r / d w_rs = z_rs: the depth term's cotangent
                # joins the photometric one BEFORE the suffix scan
                gw = gw + gdep[p] * rows(z_ref, p)
            # suffix_s = sum_{u>s, same ray} gw_u * w_u: transposed scan
            suffix = _f32dot(gw * w_rs_l[p], jnp.where(rr > cc, 1.0, 0.0))
            # -suffix / (1 - alpha + eps): finite AND non-zero at
            # saturation (matches autodiff through the guarded cumprod)
            galpha = trans_l[p] * gw - suffix / one_m_l[p]
            gsigma = (
                galpha * dists_l[p] * (1.0 - alpha_l[p]) * relu_l[p]
            )  # [Rp, S]
            # σ cotangent into the part's alpha lane (4p+3)
            sig_spread = jnp.where(
                jnp.logical_and(cSQ // 4 == p, cSQ % 4 == 3), 1.0, 0.0
            )  # [S, Q]
            term = _f32dot(expand(gsigma) * lane_sel, sig_spread)
            gsig_pk = term if gsig_pk is None else gsig_pk + term

        draw_rgb = (w_pk * gr) * rgb4 * (1.0 - rgb4)  # sigmoid'; once
        gs_pk = draw_rgb + gsig_pk  # [Bp, Q] raw cotangent, packed
        # unpack per-part [Bp, 4] cotangents for the (unchanged) backward
        # chain — exact 2-pass dots: gs feeds the bias-gradient sums
        gs = [
            _coord_dot(gs_pk, un_mats[p], (((1,), (0,)), ((), ())))
            for p in range(P)
        ]

        first = pl.program_id(0) == 0
        val = loss_total.reshape(1, 1)

        @pl.when(first)
        def _():
            out_loss[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            out_loss[:] = out_loss[:] + val

        if ablate == "no_bwd":

            @pl.when(first)
            def _():
                for r in (*dmats, *dbs):
                    r[...] = jnp.zeros_like(r)

            return

        _backward_chain_parts(
            model, compute_dtype, dw_dtype, mats, dmats, dbs, saveds,
            xyz_p, dir_p, tuple(gs),
        )

    return kernel


def make_fused_pass_loss(
    model: FlexibleNeRFModel,
    *,
    block_samples: int = 512,
    compute_dtype=jnp.float32,
    dw_dtype=None,
    white_background: bool = False,
    supervision: str = "rgb",
    interpret: bool = False,
    parts: Optional[int] = None,
    ablate: Optional[str] = None,
):
    """One render pass as a fused loss op.

    Returns ``passfn(params, origins [N,3], directions [N,3], z_vals [N,S],
    viewdirs [N,3], dists [N,S], noise [N,S] | None, target [N,3]) ->
    (loss_sum, weights [N,S], rgb [N,3])`` — sample positions
    ``o + d*z`` are computed in-kernel from the per-ray inputs (no
    [N, S, 3] HBM intermediates) — where ``loss_sum`` is the UNNORMALIZED
    sum of squared
    errors over real rays, differentiable w.r.t. ``params`` only (the
    parameter gradients are computed inside the forward kernel and the
    custom-VJP backward scales them by the loss cotangent; the cotangents
    of ``weights``/``rgb`` and of all array inputs are zero by contract —
    exact in the NeRF train graph, see module docstring).
    """
    if not model.use_viewdirs:
        raise NotImplementedError(
            "fused train loss requires use_viewdirs=True"
        )
    if supervision not in ("rgb", "luminance"):
        raise ValueError(f"unknown supervision mode: {supervision}")
    kernels = {}

    def get_kernel(S: int, has_noise: bool, parts: int, has_depth: bool):
        k = (S, has_noise, parts, has_depth)
        if k not in kernels:
            kernels[k] = _make_loss_kernel(
                model, compute_dtype, dw_dtype, S,
                bool(white_background), supervision, has_noise,
                parts=parts, ablate=ablate, has_depth=has_depth,
            )
        return kernels[k]

    names = _flex_param_layout(model)

    def _kernel_call(params, origins, directions, z_vals, viewdirs, dists,
                     noise, target, depth_gt=None, depth_coef=None):
        N, S = z_vals.shape
        total = N * S
        has_noise = noise is not None
        has_depth = depth_gt is not None
        block, pad, rays_per_block = _loss_ray_blocking(block_samples, N, S)
        n_blocks = (total + pad) // block
        # ray-part interleave: the most parts whose [Rp, S] tiles keep
        # >= 8 sublane rows (measured monotone wins through p8 on v5e —
        # PERF_NOTES "interleave"); explicit ``parts`` overrides. When
        # blocked (grid > 1) the packed [Rp, 4P] target/valid blocks also
        # need a leading dim that is a multiple of 8 (Mosaic block-dim
        # constraint).
        def parts_ok(p):
            rp = rays_per_block // p
            return rays_per_block % p == 0 and rp >= 8 and (
                n_blocks == 1 or rp % 8 == 0
            )

        if parts is not None and parts_ok(parts):
            n_parts = parts
        else:
            if parts is not None:
                import warnings

                warnings.warn(
                    f"fused loss: parts={parts} violates the Mosaic "
                    f"[Rp, S] tile floor (rays_per_block={rays_per_block} "
                    f"needs Rp >= 8, a multiple of 8 when blocked); using "
                    f"the auto rule instead",
                    stacklevel=2,
                )
            n_parts = 1
            for p in (8, 4, 2):
                if parts_ok(p):
                    n_parts = p
                    break
        n_ray_pad = (total + pad) // S

        def pad_rays(a):
            return jnp.pad(a, ((0, n_ray_pad - N), (0, 0)))

        # origins/directions stream PER-RAY and z in rays-x-samples layout;
        # pts = o + d*z is computed in-kernel (no [N, S, 3] intermediates —
        # see kernel comment)
        orig_in = pad_rays(origins)
        rdir_in = pad_rays(directions)
        z_rows = pad_rays(z_vals)
        dirs_in = pad_rays(viewdirs)
        # dists/noise stream in rays-x-samples layout — the kernel's σ
        # chain runs in dense [R, S] tiles (see kernel comment)
        dists_rows = pad_rays(dists)
        R = rays_per_block
        Rp = R // n_parts
        Q = 4 * n_parts

        def pack_rays4(a):
            # [n_ray_pad, 4] -> [n_blocks * Rp, 4P]: part p's rays of each
            # block land in lanes 4p..4p+3 (matches the kernel's packed
            # rgb-lane layout; host-side, exact, fuses into the pads)
            return (
                a.reshape(n_blocks, n_parts, Rp, 4)
                .transpose(0, 2, 1, 3)
                .reshape(n_blocks * Rp, Q)
            )

        target4 = jnp.pad(
            target.astype(jnp.float32), ((0, n_ray_pad - N), (0, 1))
        )
        # valid doubles as the rgb-lane mask: 1 on real rays' rgb lanes,
        # 0 on padding rays AND on every alpha lane
        valid4 = jnp.pad(
            jnp.ones((N, 1), jnp.float32), ((0, n_ray_pad - N), (0, 0))
        ) * jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)
        target_pk = pack_rays4(target4)
        valid_pk = pack_rays4(valid4)

        mats, bs = split_flex_params(model, params, compute_dtype)
        bs_real = bs[: len(names)]
        # combined head bias ([rgb_b, alpha_b]) tiled to the packed lane
        # layout (the packed rgb head emits raw WITHOUT bias)
        bias_pk = jnp.tile(bs[-1].astype(jnp.float32), n_parts).reshape(
            1, Q
        )
        inputs = [orig_in, rdir_in, z_rows, dirs_in, dists_rows]
        if has_noise:
            inputs.append(pad_rays(noise))
        if has_depth:
            inputs.append(pad_rays(depth_gt.reshape(N, 1)))
            inputs.append(pad_rays(depth_coef.reshape(N, 1)))
        inputs += [target_pk, valid_pk, bias_pk]
        padded = total + pad
        grid = (padded // block,)

        def blk(shape2):
            return pl.BlockSpec(
                shape2, lambda i: (i, 0), memory_space=pltpu.VMEM
            )

        def full2d(arrs):
            return [
                pl.BlockSpec(
                    a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                )
                for a in arrs
            ]

        in_specs = [blk((R, 3)), blk((R, 3)), blk((R, S)),
                    blk((R, 3)), blk((R, S))]
        if has_noise:
            in_specs.append(blk((R, S)))
        if has_depth:
            in_specs += [blk((R, 1)), blk((R, 1))]
        in_specs += [
            blk((Rp, Q)),
            blk((Rp, Q)),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        in_specs += full2d(mats)
        in_specs += [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # loss sum
            jax.ShapeDtypeStruct((n_ray_pad, S), jnp.float32),  # weights
            jax.ShapeDtypeStruct((n_ray_pad, 4), jnp.float32),  # rgb
        ]
        out_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            blk((R, S)),
            blk((R, 4)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(m.shape, jnp.float32) for m in mats
        ] + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_real]
        out_specs += full2d(mats) + [
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
            for b in bs_real
        ]

        outs = pl.pallas_call(
            get_kernel(S, has_noise, n_parts, has_depth),
            out_shape=tuple(out_shapes),
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
            # the combined kernel legitimately holds the forward activations
            # through the backward chain; the default 16 MB scoped-VMEM
            # budget is a compiler default, not the hardware bound (v5e has
            # 128 MB of VMEM) — raise it rather than shrink blocks
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*inputs, *mats, *bs)

        loss_sum = outs[0][0, 0]
        weights = outs[1][:N]
        rgb = outs[2][:N, :3]
        dmats = outs[3 : 3 + len(mats)]
        dbs = outs[3 + len(mats) :]
        grads = _assemble_grads(model, dmats, dbs)
        return (loss_sum, weights, rgb), grads

    @jax.custom_vjp
    def passfn(params, origins, directions, z_vals, viewdirs, dists, noise,
               target):
        outs, _ = _kernel_call(
            params, origins, directions, z_vals, viewdirs, dists, noise,
            target,
        )
        return outs

    def passfn_fwd(params, origins, directions, z_vals, viewdirs, dists,
                   noise, target):
        outs, grads = _kernel_call(
            params, origins, directions, z_vals, viewdirs, dists, noise,
            target,
        )
        return outs, (grads, origins, directions, z_vals, viewdirs, dists,
                      noise, target)

    def passfn_bwd(res, g):
        (grads, origins, directions, z_vals, viewdirs, dists, noise,
         target) = res
        g_loss = g[0]  # cotangents of weights/rgb are zero by contract
        dparams = jax.tree.map(lambda t: t * g_loss, grads)
        return (
            dparams,
            jnp.zeros_like(origins),
            jnp.zeros_like(directions),
            jnp.zeros_like(z_vals),
            jnp.zeros_like(viewdirs),
            jnp.zeros_like(dists),
            None if noise is None else jnp.zeros_like(noise),
            jnp.zeros_like(target),
        )

    passfn.defvjp(passfn_fwd, passfn_bwd)

    # depth-supervised variant: same contract (params-only gradients — the
    # depth term flows through w, whose z/dists inputs are stop_gradient-ed
    # in the train graph exactly like the photometric term's)
    @jax.custom_vjp
    def passfn_d(params, origins, directions, z_vals, viewdirs, dists,
                 noise, target, depth_gt, depth_coef):
        outs, _ = _kernel_call(
            params, origins, directions, z_vals, viewdirs, dists, noise,
            target, depth_gt, depth_coef,
        )
        return outs

    def passfn_d_fwd(params, origins, directions, z_vals, viewdirs, dists,
                     noise, target, depth_gt, depth_coef):
        outs, grads = _kernel_call(
            params, origins, directions, z_vals, viewdirs, dists, noise,
            target, depth_gt, depth_coef,
        )
        return outs, (grads, origins, directions, z_vals, viewdirs, dists,
                      noise, target, depth_gt, depth_coef)

    def passfn_d_bwd(res, g):
        (grads, origins, directions, z_vals, viewdirs, dists, noise,
         target, depth_gt, depth_coef) = res
        g_loss = g[0]
        dparams = jax.tree.map(lambda t: t * g_loss, grads)
        return (
            dparams,
            jnp.zeros_like(origins),
            jnp.zeros_like(directions),
            jnp.zeros_like(z_vals),
            jnp.zeros_like(viewdirs),
            jnp.zeros_like(dists),
            None if noise is None else jnp.zeros_like(noise),
            jnp.zeros_like(target),
            jnp.zeros_like(depth_gt),
            jnp.zeros_like(depth_coef),
        )

    passfn_d.defvjp(passfn_d_fwd, passfn_d_bwd)

    def pass_loss(params, origins, directions, z_vals, viewdirs, dists,
                  noise, target, depth_gt=None, depth_coef=None):
        # stop_gradient makes the zero-input-cotangent contract explicit and
        # lets XLA DCE the structural zeros the VJP must return
        sg = jax.lax.stop_gradient
        if depth_gt is not None:
            return passfn_d(
                params, sg(origins), sg(directions), sg(z_vals),
                sg(viewdirs), sg(dists),
                None if noise is None else sg(noise), sg(target),
                sg(depth_gt), sg(depth_coef),
            )
        return passfn(
            params, sg(origins), sg(directions), sg(z_vals), sg(viewdirs),
            sg(dists), None if noise is None else sg(noise), sg(target),
        )

    return pass_loss


def make_fused_train_loss(
    coarse_model: FlexibleNeRFModel,
    fine_model: Optional[FlexibleNeRFModel],
    settings,
    *,
    supervision: str = "rgb",
    block_samples: int = 512,
    compute_dtype=jnp.float32,
    dw_dtype=None,
    interpret: bool = False,
    parts: Optional[int] = None,
    resample: str = "auto",
    depth_loss_weight: float = 0.0,
    depth_valid_max: Optional[float] = None,
):
    """The full hierarchical training loss on the combined kernels.

    Returns ``loss_fn(params, rays: RayBatch, target [N,3], key) ->
    (loss, metrics)`` — a drop-in for the ``render_rays`` + ``nerf_loss``
    body of the train step (``train.step.make_train_step(fused_loss=...)``).
    Stratified z-sampling and σ-noise generation stay XLA (cheap,
    [N, S]-sized) with the SAME key-split structure as ``render_rays``, so
    training trajectories are draw-for-draw comparable; everything
    sample-major runs inside the fused kernels. ``resample``: "pallas"
    runs the hierarchical inverse-CDF + merge-sort + dists between the two
    passes in the fused resample kernel (``ops.resample_pallas``, the
    same uniform draws as the XLA path, values within ~1 ulp); "xla" keeps
    it in XLA; "auto" (default) resolves to XLA — measured on chip
    (tools/scan_step_probe.py A/B, batch 16384): the pallas resample is
    52.3 vs XLA's 43.7 ms/step, because the bit-exact 3-pass relocation
    dots the stable merge requires cost ~9 ms while the XLA glue they
    replace costs ~1.2 ms. The kernel stays available opt-in
    ("pallas") as the launch-overhead hedge it was built to be.

    ``depth_loss_weight`` > 0 adds GT-depth supervision INSIDE the kernel:
    ``weight * masked MSE`` of the expected depth ``Σ w·z`` against per-ray
    GT (the same term as ``train.step.masked_depth_mse``; the depth
    cotangent joins the photometric one before the compositing backward's
    suffix scan). The returned ``loss_fn`` then takes a 5th argument
    ``depth_gt [N]`` and advertises ``supports_depth = True``; the term
    rides the fine pass (coarse when no fine model). Valid mask
    ``gt > 0 [& gt < depth_valid_max]`` is computed in XLA per batch.
    """
    from dexnerf_tpu.core.sampling import (
        hierarchical_z_vals,
        perturb_z_vals,
        stratified_z_vals,
    )
    from dexnerf_tpu.core.volrend import ray_dists
    from dexnerf_tpu.ops.resample_pallas import make_fused_resample

    s = settings
    if not s.use_viewdirs:
        raise NotImplementedError(
            "fused train loss requires use_viewdirs=True"
        )
    kwargs = dict(
        block_samples=block_samples,
        compute_dtype=compute_dtype,
        dw_dtype=dw_dtype,
        white_background=s.white_background,
        supervision=supervision,
        interpret=interpret,
        parts=parts,
    )
    coarse_pass = make_fused_pass_loss(coarse_model, **kwargs)
    fine_pass = (
        make_fused_pass_loss(fine_model, **kwargs)
        if fine_model is not None and s.num_fine > 0
        else None
    )
    std = float(s.radiance_field_noise_std)

    if resample == "auto":
        # chip-measured: XLA resample wins (see docstring); pallas is opt-in
        resample = "xla"
    resample_fn = (
        make_fused_resample(s.num_coarse, s.num_fine, interpret=interpret)
        if resample == "pallas" and fine_pass is not None
        else None
    )

    use_depth = depth_loss_weight > 0.0

    def loss_fn(params, rays, target, key, depth_gt=None):
        # same split structure as renderer.render_rays
        if key is not None:
            k_strat, k_noise_c, k_fine, k_noise_f = jax.random.split(key, 4)
        else:
            k_strat = k_noise_c = k_fine = k_noise_f = None
        if use_depth and depth_gt is None:
            raise ValueError(
                "fused loss built with depth_loss_weight > 0 needs the "
                "per-ray depth_gt argument (sample with return_depth=True)"
            )

        z_vals = stratified_z_vals(
            rays.near, rays.far, s.num_coarse, lindisp=s.lindisp
        )
        if s.perturb:
            z_vals = perturb_z_vals(k_strat, z_vals)

        def noise_for(k, shape):
            if std > 0.0 and k is not None:
                return std * jax.random.normal(k, shape, dtype=jnp.float32)
            return None

        n = target.shape[0]
        norm = float(n * 3 if supervision == "rgb" else n)

        dcoef = None
        if use_depth:
            depth_gt = jnp.asarray(depth_gt, jnp.float32).reshape(n)
            mask = depth_gt > 0.0
            if depth_valid_max is not None:
                mask = jnp.logical_and(mask, depth_gt < depth_valid_max)
            mask = mask.astype(jnp.float32)
            n_valid = jnp.maximum(jnp.sum(mask), 1.0)
            # premultiplied so the kernel's unnormalized sum, divided by
            # the wrapper's /norm, lands exactly on weight * masked MSE
            dcoef = (norm * depth_loss_weight / n_valid) * mask

        depth_on_coarse = use_depth and (
            fine_model is None or s.num_fine <= 0
        )
        loss_c_sum, w_c, _ = coarse_pass(
            params["coarse"], rays.origins, rays.directions, z_vals,
            rays.viewdirs, ray_dists(z_vals, rays.directions),
            noise_for(k_noise_c, z_vals.shape), target,
            *((depth_gt, dcoef) if depth_on_coarse else (None, None)),
        )
        coarse_loss = loss_c_sum / norm

        def depth_metric(w_pass, z_pass):
            # report the masked depth MSE from the kernel's returned
            # weights (same f32 values the in-kernel term saw)
            d_pred = jnp.sum(w_pass * z_pass, axis=-1)
            return jnp.sum(mask * (d_pred - depth_gt) ** 2) / n_valid

        depth_loss = None
        if depth_on_coarse:
            depth_loss = depth_metric(w_c, z_vals)

        fine_loss = jnp.zeros((), jnp.float32)
        if fine_pass is not None:
            sg = jax.lax.stop_gradient
            if resample_fn is not None:
                # the same uniform draws sample_pdf would make from k_fine
                if s.perturb:
                    if k_fine is None:
                        # match the XLA path's contract (sample_pdf raises
                        # for det=False with no key) instead of silently
                        # substituting the deterministic grid
                        raise ValueError(
                            "perturbed hierarchical sampling requires a "
                            "PRNG key (key=None was passed to the fused "
                            "train loss)"
                        )
                    u = jax.random.uniform(
                        k_fine, (n, s.num_fine), dtype=jnp.float32
                    )
                else:
                    u = jnp.broadcast_to(
                        jnp.linspace(0.0, 1.0, s.num_fine), (n, s.num_fine)
                    )
                dn = jnp.linalg.norm(
                    rays.directions, axis=-1, keepdims=True
                )
                z_merged, dists_f = resample_fn(
                    sg(z_vals), sg(w_c), u, sg(dn)
                )
                z_merged, dists_f = sg(z_merged), sg(dists_f)
            else:
                z_merged, _ = hierarchical_z_vals(
                    k_fine, z_vals, w_c, s.num_fine, det=not s.perturb
                )
                dists_f = ray_dists(z_merged, rays.directions)
            depth_on_fine = use_depth and not depth_on_coarse
            loss_f_sum, w_f, _ = fine_pass(
                params["fine"], rays.origins, rays.directions, z_merged,
                rays.viewdirs, dists_f,
                noise_for(k_noise_f, z_merged.shape), target,
                *((depth_gt, dcoef) if depth_on_fine else (None, None)),
            )
            fine_loss = loss_f_sum / norm
            if depth_on_fine:
                depth_loss = depth_metric(w_f, z_merged)

        loss = coarse_loss + fine_loss  # pass sums include the depth term
        metrics = {
            "loss": loss,
            "coarse_loss": coarse_loss,
            "fine_loss": fine_loss,
        }
        if depth_loss is not None:
            # report the photometric split the XLA path reports: the pass
            # that carried the depth term has it subtracted back out (the
            # metric recompute uses the kernel's own returned weights)
            d = depth_loss_weight * depth_loss
            if depth_on_coarse:
                metrics["coarse_loss"] = coarse_loss - d
            else:
                metrics["fine_loss"] = fine_loss - d
            metrics["depth_loss"] = depth_loss
        return loss, metrics

    loss_fn.supports_depth = use_depth
    return loss_fn
