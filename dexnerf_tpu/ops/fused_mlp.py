"""Fused positional-encoding + NeRF-MLP field evaluation (Pallas TPU kernel).

The BASELINE.json north star: "the per-ray hot loop (positional encoding →
MLP with skip → alpha-compositing) fuses into Pallas kernels so encoded
samples never round-trip to HBM". This kernel implements the PE→MLP part for
``FlexibleNeRFModel``: for each block of samples, the frequency encoding of
positions and view directions is built directly in VMEM, the whole trunk
(with its skip connection) plus σ/rgb heads run as back-to-back MXU matmuls
on VMEM-resident weights, and only the [S, 4] raw radiance field is written
back to HBM. Profiling shows the XLA path is HBM-bound on exactly these
intermediates (docs/PERF_NOTES.md).

Mosaic-friendly layout decisions:

* no ragged concatenations: the skip connection and the viewdir join are
  expressed as SPLIT matmuls (``h @ W_h + enc @ W_x``) on aligned operands;
* encodings are padded to a multiple of 16 lanes (bf16 sublane tile) with
  zero columns, with matching zero rows padded into the weights host-side;
* ``compute_dtype=bfloat16`` runs the trunk matmuls at full MXU rate with
  float32 accumulation; the tiny σ/rgb head matmuls stay float32.

Layer structure mirrors ``dexnerf_tpu.models.mlp.FlexibleNeRFModel``
(reference semantics: ``nerf-pytorch/nerf/models.py:185-256``, skip bug
fixed): layer1 (no activation), trunk with relu + skip, then
feat/alpha/dir/rgb heads.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dexnerf_tpu.models.mlp import FlexibleNeRFModel
from dexnerf_tpu.render.renderer import FieldFn


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _coord_dot(x, sel, dims, x_operand: int = 0):
    """Value-exact structural dot for operands that carry COORDINATES.

    Mosaic's DEFAULT f32 dot truncates operands to bf16 (measured 3.9e-3
    on unit-scale values), and a 2^-9 relative pts error is amplified by
    the top encoding frequency (2^(F-1)) into an O(1) sin phase error in
    the positional encoding; fixing it cut the combined kernel's on-chip
    grad residual vs XLA autodiff from 4.6e-2 to 6e-3. ``sel`` is a 0/1
    selection matrix (exactly bf16-representable), so all truncation error
    comes from ``x``: splitting x into a bf16-representable ``hi`` plus the
    f32 residual ``lo`` makes two DEFAULT-precision passes exact to ~2^-18
    relative — Precision.HIGHEST costs 6 passes (measured +3.0 ms/step on
    the combined loss kernel) and Mosaic has no 3-pass Precision.HIGH.
    ``x_operand`` says whether x is the lhs (0) or rhs (1) of the dot.

    The ``hi`` part is held as REAL bf16 (not an f32 tensor rounded to
    bf16 values): with both operands f32 the compiler can algebraically
    REFOLD ``dot(hi, S) + dot(lo, S)`` into ``dot(hi + lo, S)``, silently
    restoring the truncation this split exists to avoid (round-3 chip
    bisection in ``resample_pallas`` — exact in an isolated
    probe, 2.5e-3 inside a large kernel). bf16 x bf16 -> f32 makes the
    hi-dot exact by construction and the mixed dtypes make the refold
    impossible; the lo-dot's own truncation is bounded by 2^-9 of the
    residual, i.e. ~2^-18 of x — the same bound as before."""
    hi = x.astype(jnp.bfloat16)
    lo = x - hi.astype(jnp.float32)

    def d(part, s):
        operands = (part, s) if x_operand == 0 else (s, part)
        return jax.lax.dot_general(
            *operands, dims, preferred_element_type=jnp.float32
        )

    # sel is 0/1 (exactly bf16-representable), so casting it for the hi
    # pass loses nothing
    return d(hi, sel.astype(jnp.bfloat16)) + d(lo, sel)


# 3-term Cody-Waite split of pi. hi/mid carry only 12 mantissa bits, so
# n*hi and n*mid are EXACT f32 products for |n| <= 2^12 — the subtractions
# then cancel exactly and the reduced argument is accurate to ~1e-10.
_PI_HI = 3.140625
_PI_MID = 9.675025939941406e-04
_PI_LO = 1.5099580252808664e-07
# minimax odd polynomial for sin on [-pi/2, pi/2] (fit on Chebyshev nodes;
# max abs error 3.4e-9 — below f32 output ulp)
_SIN_C = (
    9.99999977e-01,
    -1.66666476e-01,
    8.33289922e-03,
    -1.98008653e-04,
    2.59043003e-06,
)


def _fast_sin(x):
    """f32-accurate sin for the positional encoding, ~4x cheaper than the
    Mosaic ``sin`` lowering.

    The on-chip ablation (tools/loss_kernel_ablation.py, docs/PERF_NOTES.md
    round 3) measured ``jnp.sin`` over the PE tiles at 4.5 ms of a 17.5 ms
    combined-kernel pass — 26% of the whole train pass, the single largest
    cost after the MLP dots. This replacement is range-reduction by pi
    (round + two exact Cody-Waite fmas) + sign fixup + a degree-9 odd
    minimax polynomial: ~12 VPU ops/element. Measured max abs error vs
    f64 sin: 1.6e-7 (2-3 output ulps) for |x| up to 2^12*pi — far beyond
    the PE argument range (top frequency 2^(F-1) x |pts| <= far), and
    invisible under the bf16 truncation the PE values meet at the next
    MXU dot. For |x| > 2^12*pi the n*pi_hi product starts rounding and
    accuracy degrades gracefully (~1e-3 at |x|~5e4) — at those magnitudes
    the f32 ARGUMENT itself already quantizes coarser than that, so true
    sin is no better.
    """
    n = jnp.floor(x * jnp.float32(1.0 / np.pi) + 0.5)
    r = ((x - n * _PI_HI) - n * _PI_MID) - n * _PI_LO
    # sign = (-1)^n without integer ops: frac(n/2) is 0 or 0.5
    half = n * 0.5
    sign = 1.0 - 4.0 * (half - jnp.floor(half))
    r2 = r * r
    p = jnp.float32(_SIN_C[4])
    for c in (_SIN_C[3], _SIN_C[2], _SIN_C[1], _SIN_C[0]):
        p = p * r2 + c
    return sign * r * p


def _expand_rows(x, reps: int, out_rows: int):
    """[R, D] -> [out_rows, D], repeating each row ``reps`` times, via a
    one-hot expansion matmul (MXU) — sublane-repeat relayouts are slow in
    Mosaic, and Pallas kernels cannot capture array constants, so the
    expansion matrix is built from iotas."""
    r = jax.lax.broadcasted_iota(jnp.int32, (out_rows, x.shape[0]), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (out_rows, x.shape[0]), 1)
    E = jnp.where(r // reps == c, 1.0, 0.0)
    return jax.lax.dot_general(
        E, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pe_in_kernel(x, num_freq: int, include_input: bool, padded_dim: int,
                  exact: bool = True, _skip_sin: bool = False):
    """Positional encoding built inside the kernel, zero-padded to
    ``padded_dim`` ([B, 3] -> [B, padded_dim], float32).

    Mosaic-friendly form: the round-1 version concatenated ~21 unaligned
    [B, 3] pieces, which lowers to a cascade of lane relayouts and made the
    kernel VPU-bound. Here the column layout ``[x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), ...]`` is produced by ONE tiny one-hot projection matmul
    (the projector and the per-column frequency/phase rows are built from
    iotas — Pallas kernels cannot capture array constants), then a single
    fused ``sin`` over the whole tile (``cos z = sin(z + pi/2)``).
    Zero concatenations.
    """
    base = 3 if include_input else 0
    dim = base + 6 * num_freq
    c = jax.lax.broadcasted_iota(jnp.int32, (1, padded_dim), 1)
    k = c - base  # index within the sin/cos block
    is_input = c < base
    valid = jnp.logical_and(k >= 0, c < dim)
    kc = jnp.clip(k, 0, max(6 * num_freq - 1, 0))
    group = kc // 3  # (freq, fn) pair index; fn: 0 = sin, 1 = cos
    dim_of = jnp.where(is_input, c, kc % 3)  # source input dim per column
    freq = jnp.where(
        valid, jnp.exp2(jnp.floor(group.astype(jnp.float32) / 2.0)), 0.0
    )
    phase = jnp.where(
        jnp.logical_and(valid, group % 2 == 1), np.float32(np.pi / 2), 0.0
    )
    r = jax.lax.broadcasted_iota(jnp.int32, (3, padded_dim), 0)
    live = jnp.logical_or(is_input, valid)  # zero projector for pad columns
    P = jnp.where(jnp.logical_and(r == dim_of, live), 1.0, 0.0)
    # _coord_dot: this projection carries the raw coordinates — default
    # precision would put an O(1) phase error into the top-frequency sin
    # columns (see _coord_dot's comment). exact=False is timing-ablation
    # only (tools/loss_kernel_ablation.py).
    if exact:
        xt = _coord_dot(x, P, (((1,), (0,)), ((), ())))
    else:
        xt = jax.lax.dot_general(
            x, P, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    arg = xt * freq + phase
    # _skip_sin is timing-ablation only (tools/loss_kernel_ablation.py)
    z = arg if _skip_sin else _fast_sin(arg)
    # padded columns: projector column is zero -> xt = 0 and sin(0) = 0
    return jnp.where(is_input, xt, z)


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


class _Dims(NamedTuple):
    dim_xyz: int
    dim_dir: int
    pad_xyz: int  # padded encoding widths (multiples of 16)
    pad_dir: int


def _dims(model: FlexibleNeRFModel) -> _Dims:
    dx = (3 if model.include_input_xyz else 0) + 6 * model.num_encoding_fn_xyz
    dd = (3 if model.include_input_dir else 0) + 6 * model.num_encoding_fn_dir
    return _Dims(dx, dd, _round_up(dx, 16), _round_up(dd, 16))


def split_flex_params(model: FlexibleNeRFModel, params: Any, compute_dtype):
    """Host-side weight prep for the aligned kernels.

    Returns (mats, biases) where ``mats`` is a flat tuple of matmul operands
    in kernel consumption order — skip layers contribute (W_h, W_x) pairs and
    the viewdir layer (W_feat_part, W_dir_part) — with encoding-facing rows
    zero-padded to the padded encoding widths, trunk/feat/dir weights cast to
    ``compute_dtype`` and head (alpha/rgb) weights kept float32.

    The alpha/rgb head weights are column-padded to 4 wide (alpha in column
    3, rgb in 0-2) so the kernel forms the [B, 4] raw output as a SUM of two
    matmuls instead of an unaligned lane concatenation, and for viewdirs a
    combined 4-wide head bias [rgb_b, alpha_b] is APPENDED to the bias tuple
    (it is a derived constant, not an extra parameter).
    """
    ks, bs = flatten_flex_params(model, params)
    d = _dims(model)
    skip = set(_skip_indices(model))
    num_trunk = model.num_layers - 1
    H = model.hidden_size

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    mats: List = []
    # layer1: [dx, H] -> [pad_xyz, H]
    mats.append(pad_rows(ks[0], d.pad_xyz).astype(compute_dtype))
    for i in range(num_trunk):
        w = ks[1 + i]
        if i in skip:
            mats.append(w[:H].astype(compute_dtype))  # W_h [H, H]
            mats.append(
                pad_rows(w[H:], d.pad_xyz).astype(compute_dtype)
            )  # W_x
        else:
            mats.append(w.astype(compute_dtype))
    li = model.num_layers
    biases = [b.astype(jnp.float32) for b in bs]
    if model.use_viewdirs:
        mats.append(ks[li].astype(compute_dtype))  # fc_feat [H, H]
        # fc_alpha [H, 1] -> [H, 4] (column 3)
        mats.append(
            jnp.pad(ks[li + 1], ((0, 0), (3, 0))).astype(jnp.float32)
        )
        w_dir = ks[li + 2]  # [(H + dd), H//2]
        mats.append(w_dir[:H].astype(compute_dtype))
        mats.append(pad_rows(w_dir[H:], d.pad_dir).astype(compute_dtype))
        # fc_rgb [H//2, 3] -> [H//2, 4] (columns 0-2)
        mats.append(
            jnp.pad(ks[li + 3], ((0, 0), (0, 1))).astype(jnp.float32)
        )
        # combined head bias [rgb_b, alpha_b]
        biases.append(
            jnp.concatenate([bs[li + 3], bs[li + 1]]).astype(jnp.float32)
        )
    else:
        mats.append(ks[li].astype(jnp.float32))  # fc_out [H, 4]
    return tuple(mats), tuple(biases)


def _dot(x, w, out_dtype):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _forward_block(model, mats, biases, xyz, dir_enc, compute_dtype,
                   keep_activations=False):
    """The shared forward math over one VMEM-resident sample block.

    ``xyz``/``dir_enc``: padded f32 encodings. Returns raw [B, 4] f32;
    with ``keep_activations`` it instead returns
    ``(out, trunk_inputs, a_last, feat, y)`` where the saved activations
    are in ``compute_dtype`` (they are only ever consumed as dW matmul
    operands). Relu masks are NOT saved — every saved activation except
    ``trunk_inputs[0]`` is post-relu, so the backward derives each mask as
    ``act > 0`` on the spot (``_backward_chain``), halving the saved-state
    VMEM a second time (the first halving was storing in compute_dtype) —
    that is what fits the combined loss kernel's fine pass in the 16 MB
    scoped-VMEM budget.

    Dtype discipline (the round-1 Mosaic-crash fix): the CHAIN — every
    activation, bias add, relu/select — stays float32; ``compute_dtype``
    only casts matmul OPERANDS at the dot call sites (weights arrive
    pre-cast from ``split_flex_params``). bf16 where/astype chains crash
    the Mosaic compiler (docs/PERF_NOTES.md bisection); bf16 dot operands
    with f32 accumulation are the part that buys MXU rate anyway.
    """
    (out,), saved = _forward_block_parts(
        model, mats, biases, (xyz,), (dir_enc,), compute_dtype,
        keep_activations=keep_activations,
    )
    if keep_activations:
        trunk_inputs, a_in, feat_in, y = saved[0]
        return (out, trunk_inputs, a_in, feat_in, y)
    return out


def _forward_block_parts(model, mats, biases, xyz_parts, dir_parts,
                         compute_dtype, keep_activations=False,
                         pack_rgb_head=False):
    """``_forward_block`` over P independent row-parts, ops interleaved.

    The layer chain is LATENCY-bound on the MXU: a microbenchmark of the
    12-dot [2048, 128] chain runs at ~65% MFU, while two independent
    chains interleaved reach ~99% (a second full-size chain costs only
    +3.5% time — docs/PERF_NOTES.md "interleave experiment"). Emitting
    each layer's dots for all parts before the parts' relus gives Mosaic
    the independent instruction streams to overlap.

    Returns ``(outs, saveds)``: per-part raw [Bp, 4] outputs, and (with
    ``keep_activations``) per-part ``(trunk_inputs, a_in, feat_in, y)``
    tuples in ``compute_dtype``.

    ``pack_rgb_head`` (viewdirs models only): instead of P separate
    [Bp, 4] raws, ``outs`` is ``(raw_pk, alpha4s)`` where ``raw_pk`` is
    ONE [Bp, 4*P] tile holding part p's rgb head output (NO bias, NO
    alpha) in lanes ``4p..4p+2``, and ``alpha4s`` are the per-part [Bp, 4]
    alpha-head outputs (column 3, no bias). Per-part [Bp, 4] tiles waste
    124 of 128 lanes on every elementwise op that touches them, so the
    combined loss kernel runs its whole sigmoid/loss/backward rgb chain
    once on the packed tile instead of P times. The rgb-head weight is
    shifted into each part's lane group with an exact 2-pass dot
    (``_coord_dot``; the shift matrix is 0/1, so the per-part head dot is
    value-identical to the unpacked form).
    """
    skip = set(_skip_indices(model))
    num_trunk = model.num_layers - 1
    cd = compute_dtype
    P = len(xyz_parts)
    if pack_rgb_head and not model.use_viewdirs:
        raise NotImplementedError("pack_rgb_head requires use_viewdirs")
    xyz_ops = tuple(x.astype(cd) for x in xyz_parts)

    mi = 0
    # layer1: no activation (reference models.py:238); h stays f32
    hs = tuple(
        _dot(x, mats[mi][:], jnp.float32) + biases[0][:] for x in xyz_ops
    )
    mi += 1
    trunk_inputs = [[] for _ in range(P)]
    for i in range(num_trunk):
        h_ins = tuple(h.astype(cd) for h in hs)
        if i in skip:
            ys = tuple(
                _dot(h, mats[mi][:], jnp.float32) for h in h_ins
            )
            ys = tuple(
                y + _dot(x, mats[mi + 1][:], jnp.float32)
                for y, x in zip(ys, xyz_ops)
            )
            mi += 2
        else:
            ys = tuple(_dot(h, mats[mi][:], jnp.float32) for h in h_ins)
            mi += 1
        if keep_activations:
            for p in range(P):
                trunk_inputs[p].append(h_ins[p])
        hs = tuple(jnp.maximum(y + biases[1 + i][:], 0.0) for y in ys)
    a_lasts = hs
    li = model.num_layers
    if model.use_viewdirs:
        a_ins = tuple(a.astype(cd) for a in a_lasts)
        feats = tuple(
            jnp.maximum(
                _dot(a, mats[mi][:], jnp.float32) + biases[li][:], 0.0
            )
            for a in a_ins
        )
        mi += 1
        # alpha head: 4-wide padded weight (alpha in column 3), f32
        alpha4s = tuple(
            _dot(a, mats[mi][:], jnp.float32) for a in a_lasts
        )
        mi += 1
        feat_ins = tuple(f.astype(cd) for f in feats)
        ys = tuple(_dot(f, mats[mi][:], jnp.float32) for f in feat_ins)
        ys = tuple(
            y + _dot(d.astype(cd), mats[mi + 1][:], jnp.float32)
            for y, d in zip(ys, dir_parts)
        )
        mi += 2
        ys = tuple(jnp.maximum(y + biases[li + 2][:], 0.0) for y in ys)
        if pack_rgb_head:
            # packed rgb head: raw born as ONE [B, 4P] tile via per-part
            # lane-shifted copies of the rgb weight (see docstring). The
            # shift is applied to the WEIGHT (exact 0/1 dot), so each
            # part's head matmul is the same dot as the unpacked form.
            Q = 4 * P
            r4 = jax.lax.broadcasted_iota(jnp.int32, (4, Q), 0)
            cQ = jax.lax.broadcasted_iota(jnp.int32, (4, Q), 1)
            raw_pk = None
            for p, y in enumerate(ys):
                shift = jnp.where(cQ - 4 * p == r4, 1.0, 0.0)
                w_shift = _coord_dot(
                    mats[mi][:], shift, (((1,), (0,)), ((), ()))
                )
                term = _dot(y, w_shift, jnp.float32)
                raw_pk = term if raw_pk is None else raw_pk + term
            outs = (raw_pk, alpha4s)
        else:
            # [B, 4] raw output as a sum of padded-head matmuls + combined
            # bias (biases[-1] = [rgb_b, alpha_b]) — no lane concatenation
            outs = tuple(
                _dot(y, mats[mi][:], jnp.float32) + a4 + biases[-1][:]
                for y, a4 in zip(ys, alpha4s)
            )
    else:
        feat_ins = ys = (None,) * P
        outs = tuple(
            _dot(a, mats[mi][:], jnp.float32) + biases[li][:]
            for a in a_lasts
        )
        a_ins = tuple(a.astype(cd) for a in a_lasts)
    if keep_activations:
        saveds = tuple(
            (
                trunk_inputs[p],
                a_ins[p],
                feat_ins[p],
                ys[p].astype(cd) if ys[p] is not None else None,
            )
            for p in range(P)
        )
        return outs, saveds
    return outs, None


def _num_mats(model: FlexibleNeRFModel) -> int:
    n = 1 + (model.num_layers - 1) + len(_skip_indices(model))
    if model.use_viewdirs:
        n += 5  # feat, alpha, dir_h, dir_d, rgb
    else:
        n += 1
    return n


def _num_biases(model: FlexibleNeRFModel) -> int:
    """Bias entries passed to the kernels: one per Dense plus the combined
    4-wide head bias appended for viewdirs models (see split_flex_params)."""
    return len(_flex_param_layout(model)) + (1 if model.use_viewdirs else 0)


def _make_fwd_kernel(model: FlexibleNeRFModel, compute_dtype,
                     samples_per_ray: int = 0, parts: int = 1):
    """``samples_per_ray`` > 0 means the dirs input is PER-RAY ([R, 3],
    R = block // samples_per_ray) and is expanded to samples in-kernel —
    the caller then avoids materializing a [N*S, 3] broadcast in HBM.
    ``parts`` > 1 processes the block as independent row-parts with the
    layer chain interleaved (latency-bound MXU chains —
    ``_forward_block_parts``)."""
    d = _dims(model)
    n_mats = _num_mats(model)
    n_b = _num_biases(model)
    use_viewdirs = model.use_viewdirs

    def kernel(*refs):
        pts_ref = refs[0]
        off = 2 if use_viewdirs else 1
        mats = refs[off : off + n_mats]
        biases = refs[off + n_mats : off + n_mats + n_b]
        out_ref = refs[-1]
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
        dir_p = (None,) * P
        if use_viewdirs:
            if samples_per_ray:
                R = refs[1].shape[0]
                Rp = R // P
                dir_p = tuple(
                    _expand_rows(
                        _pe_in_kernel(
                            refs[1][p * Rp:(p + 1) * Rp, :],
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
                        refs[1][p * Bp:(p + 1) * Bp, :],
                        model.num_encoding_fn_dir,
                        model.include_input_dir, d.pad_dir,
                    )
                    for p in range(P)
                )
        outs, _ = _forward_block_parts(
            model, mats, biases, xyz_p, dir_p, compute_dtype
        )
        for p in range(P):
            out_ref[p * Bp:(p + 1) * Bp, :] = outs[p]

    return kernel


def _field_parts(rays_per_block: int, samples_per_ray: int) -> int:
    """The most interleaved row-parts for a field-kernel block: per-ray
    blocks split by rays (>= 8 rays/part); sample-flat blocks stay 1."""
    if not samples_per_ray:
        return 1
    for p in (8, 4, 2):
        if rays_per_block % p == 0 and rays_per_block // p >= 8:
            return p
    return 1


def _ray_blocking(block_samples: int, N: int, S: int):
    """(block, pad, rays_per_block) with the block a multiple of S so the
    per-ray dirs input tiles cleanly.

    With more than one grid block, Mosaic requires the per-ray block dim
    be a multiple of 8 (sublane tiling) — ``block_samples // S`` is not
    one whenever S doesn't divide the budget (e.g. the hotdog config's
    64+128 fine pass, S=192): round DOWN to the multiple of 8, with a
    floor of 8 (the floor can exceed the nominal sample budget; Mosaic's
    constraint wins over the knob)."""
    rays_per_block = max(1, min(block_samples // S, N))
    if rays_per_block < N:
        rays_per_block = max(8, (rays_per_block // 8) * 8)
    block = rays_per_block * S
    pad = (-N * S) % block
    return block, pad, rays_per_block


def make_fused_flexible_field(
    model: FlexibleNeRFModel,
    *,
    block_samples: int = 2048,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> FieldFn:
    """Build a FieldFn (params, pts[N,S,3], viewdirs[N,3]|None) -> raw[N,S,4]
    running the fused Pallas kernel."""
    use_viewdirs = model.use_viewdirs
    kernels = {}

    def get_kernel(samples_per_ray: int, parts: int = 1):
        k = (samples_per_ray, parts)
        if k not in kernels:
            kernels[k] = _make_fwd_kernel(
                model, compute_dtype, samples_per_ray=samples_per_ray,
                parts=parts,
            )
        return kernels[k]

    def field(params, pts, viewdirs):
        N, S, _ = pts.shape
        total = N * S
        pts_flat = pts.reshape(total, 3)
        mats, bs = split_flex_params(model, params, compute_dtype)

        if use_viewdirs:
            block, pad, rays_per_block = _ray_blocking(block_samples, N, S)
            if pad:
                pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
            n_ray_pad = (total + pad) // S
            dirs_in = jnp.pad(viewdirs, ((0, n_ray_pad - N), (0, 0)))
            inputs = [pts_flat, dirs_in]
            dir_spec = pl.BlockSpec(
                (rays_per_block, 3), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            extra_specs = [dir_spec]
            kernel = get_kernel(S, _field_parts(rays_per_block, S))
        else:
            block = min(block_samples, total)
            pad = (-total) % block
            if pad:
                pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
            inputs = [pts_flat]
            extra_specs = []
            kernel = get_kernel(0)

        padded = total + pad
        grid = (padded // block,)
        sample_spec = pl.BlockSpec(
            (block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs = [sample_spec] + extra_specs
        in_specs += [
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for m in mats
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
            # interleaved parts keep every part's encodings live; the
            # 16 MB scoped-VMEM budget is a compiler default, not hardware
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(*inputs, *mats, *bs)
        return out[:total].reshape(N, S, 4)

    return field
