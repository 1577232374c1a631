"""Fused hierarchical resampling: CDF + inverse-transform + merge-sort +
dists in ONE Pallas kernel, in dense rays-x-samples tiles.

Replaces the XLA glue between the coarse and fine train kernels —
``hierarchical_z_vals`` (``core/sampling.py``: ``sample_pdf`` over the coarse
midpoints + ``jnp.sort`` of the concatenation, mirroring reference
``train_utils.py:163-173`` + ``nerf_helpers.py:262-304`` +
``torchsearchsorted``) plus ``ray_dists`` (``volume_rendering_utils.py:17-27``)
— with one kernel launch. The round-3 trace showed ~1.2 ms/step of device
time in this glue (sort + a dozen small fusions) plus per-op dispatch
overhead at batch 16384; the whole chain here runs as one custom call.

Design notes (same Mosaic rules as the other kernel families):

* NO gathers and NO hardware sort. The rank of each fine sample is a
  branchless count over compare tiles (``searchsorted_right`` semantics);
  the merged SORT becomes rank arithmetic: in the stable sort of
  ``concat([z_c, z_f])`` the final position of ``z_c[m]`` is
  ``m + #{z_f < z_c[m]}`` and of ``z_f[f]`` is
  ``#{z_c <= z_f[f]} + #{z_f[j] < z_f[f]} + #{j < f: z_f[j] == z_f[f]}``
  (coarse wins ties — it precedes in the concatenation). The scatter to
  sorted order is a one-hot indicator matmul, not a scatter op.
* All per-(ray, sample) pair logic runs in expanded row tiles
  ([Rp*Sf, Sc] etc.) built by 0/1 selector matmuls — never on [B, 1]
  column chains (the 128x lane-waste rule, docs/KERNELS.md).
* Dots that carry DEPTH or CDF values use the 3-pass all-bf16 split
  (:func:`_split3`, BIT-exact on chip — the rank arithmetic compares
  round-tripped values for equality, so the ~2^-17 residual of the 2-pass
  hi/lo form corrupts the merge permutation; ``tools/exact_dot_probe.py``).
  Dots that carry only small integers (merge positions < 256) are exact in
  bf16 and use plain dots.
* Rays are processed in independent parts per block (8-sublane floor) so
  the MXU selector dots interleave with the VPU compare chains.

Value parity: identical formulas to the XLA path; the only differences are
dot-accumulation order in the CDF prefix sum (XLA cumsum is sequential) —
~1 ulp — and tie-breaks at measure-zero boundaries. Pinned by
``tests/test_ops.py::test_fused_resample_matches_xla``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _plain_dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


_DIMS = (((1,), (0,)), ((), ()))


def _split3(vals):
    """3-chunk bf16 split of an f32 tensor: ``vals == hi + mid + lo``
    bit-exactly, with ALL THREE chunks held as real bf16 tensors.

    Mosaic's default f32 dot truncates operands to bf16. The 2-pass
    ``dot(hi, T) + dot(lo, T)`` defense is NOT enough for this kernel:
    even with a bf16 hi the lo pass runs as a default f32 dot whose lo
    operand is itself truncated to bf16, leaving ~2^-17 relative error
    (round-3 chip probe, ``tools/exact_dot_probe.py``: 3.05e-5 at unit
    scale, 7675/8192 entries non-bit-exact) — and the stable-merge rank
    arithmetic below compares ROUND-TRIPPED values for equality, where
    any nonzero round-trip error corrupts the output permutation
    (observed on chip: duplicate merge positions, z_merged off by a full
    z value, loss=inf).

    Three bf16 chunks carry 24 mantissa bits = all of f32: ``hi`` takes
    the top >=8, ``mid`` the next >=8, so the residual has <=8
    significant bits and its bf16 cast is EXACT. Each pass is then a
    bf16 x bf16 -> f32 dot (exact per product), so a one-hot selector
    relocation reconstructs ``(hi + mid) + lo`` — bit-exactly ``vals``
    (the partial sums need 17 and 24 mantissa bits respectively, both
    within f32). Probe result: 0 non-bit-exact entries on chip. The
    all-bf16 operands also make the algebraic refold into a single
    truncated f32 dot (the round-3 failure mode of the f32-hi form)
    impossible by construction."""
    hi = vals.astype(jnp.bfloat16)
    r1 = vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _exact_dot_lhs(vals, sel):
    """vals [A, K] @ sel [K, L], bit-exact for 0/1 one-hot-row ``sel``."""
    hi, mid, lo = _split3(vals)
    sb = sel.astype(jnp.bfloat16)
    return (
        jax.lax.dot_general(hi, sb, _DIMS, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(mid, sb, _DIMS, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo, sb, _DIMS, preferred_element_type=jnp.float32)
    )


def _exact_dot_rhs(sel, vals):
    """sel [A, K] @ vals [K, L], bit-exact for 0/1 one-hot-row ``sel``
    (see :func:`_split3`)."""
    hi, mid, lo = _split3(vals)
    sb = sel.astype(jnp.bfloat16)
    return (
        jax.lax.dot_general(sb, hi, _DIMS, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sb, mid, _DIMS, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sb, lo, _DIMS, preferred_element_type=jnp.float32)
    )


def _make_resample_kernel(Sc: int, Sf: int, parts: int, debug_stage=None):
    S = Sc + Sf

    def kernel(zc_ref, w_ref, u_ref, dn_ref, out_z_ref, out_d_ref):
        R = zc_ref.shape[0]
        Rp = R // parts

        # shared iota selectors (Pallas kernels cannot capture constants)
        SL_c = jnp.where(  # [Sc, Sc] lane left-shift: out[:, i] = x[:, i+1]
            _iota2((Sc, Sc), 0) == _iota2((Sc, Sc), 1) + 1, 1.0, 0.0
        )
        TRI = jnp.where(  # [Sc, Sc] strict-prefix: out[:, i] = sum_{j<=i}
            _iota2((Sc, Sc), 0) <= _iota2((Sc, Sc), 1), 1.0, 0.0
        )
        B2 = Rp * Sf
        B3 = Rp * Sc
        BS = Rp * S
        EXPf = jnp.where(  # [B2, Rp] row expansion by Sf
            _iota2((B2, Rp), 0) // Sf == _iota2((B2, Rp), 1), 1.0, 0.0
        )
        EXPc = jnp.where(  # [B3, Rp] row expansion by Sc
            _iota2((B3, Rp), 0) // Sc == _iota2((B3, Rp), 1), 1.0, 0.0
        )
        LSELf = jnp.where(  # [B2, Sf] lane pick: row b -> lane b % Sf
            _iota2((B2, Sf), 0) % Sf == _iota2((B2, Sf), 1), 1.0, 0.0
        )
        LSELc = jnp.where(
            _iota2((B3, Sc), 0) % Sc == _iota2((B3, Sc), 1), 1.0, 0.0
        )
        LSELs = jnp.where(
            _iota2((BS, S), 0) % S == _iota2((BS, S), 1), 1.0, 0.0
        )
        P1 = jnp.where(  # [Sc, S] place into lanes [0, Sc)
            _iota2((Sc, S), 0) == _iota2((Sc, S), 1), 1.0, 0.0
        )
        P2 = jnp.where(  # [Sf, S] place into lanes [Sc, S)
            _iota2((Sf, S), 0) + Sc == _iota2((Sf, S), 1), 1.0, 0.0
        )
        G_S = jnp.where(  # [Rp, BS] ray-group over (ray, source) rows
            _iota2((Rp, BS), 1) // S == _iota2((Rp, BS), 0), 1.0, 0.0
        )
        G_f = jnp.where(  # [Rp, B2] ray-group over (ray, fine) rows
            _iota2((Rp, B2), 1) // Sf == _iota2((Rp, B2), 0), 1.0, 0.0
        )
        G_c = jnp.where(  # [Rp, B3] ray-group over (ray, coarse) rows
            _iota2((Rp, B3), 1) // Sc == _iota2((Rp, B3), 0), 1.0, 0.0
        )
        EXPs = jnp.where(  # [BS, Rp] row expansion by S
            _iota2((BS, Rp), 0) // S == _iota2((BS, Rp), 1), 1.0, 0.0
        )
        SL_S = jnp.where(  # [S, S] lane left-shift on merged lanes
            _iota2((S, S), 0) == _iota2((S, S), 1) + 1, 1.0, 0.0
        )
        lane_c = _iota2((Rp, Sc), 1)
        edge_valid2 = _iota2((B2, Sc), 1) <= Sc - 2  # cdf/bins lanes

        for p in range(parts):
            sl = slice(p * Rp, (p + 1) * Rp)
            zc = zc_ref[sl, :]  # [Rp, Sc]
            w = w_ref[sl, :]
            u = u_ref[sl, :]  # [Rp, Sf]

            # --- bins (coarse midpoints) + cdf, lanes [0, Sc-1) valid ---
            z_next = _exact_dot_lhs(zc, SL_c)
            mids = 0.5 * (zc + z_next)  # lane i: mid(z_i, z_i+1), i<Sc-1
            mass_valid = jnp.logical_and(lane_c >= 1, lane_c <= Sc - 2)
            mass = jnp.where(mass_valid, w + 1e-5, 0.0)
            pdf = mass / jnp.sum(mass, axis=1, keepdims=True)
            # cdf[i] = sum_{j <= i} pdf[j]; pdf lane 0 is 0, so this equals
            # the XLA [0, cumsum(pdf_x)] with pdf_x[m] at lane m+1
            cdf = _exact_dot_lhs(pdf, TRI)

            # --- inverse-CDF (sample_pdf masked-extrema formulation) ---
            cdf_rows = _exact_dot_rhs(EXPf, cdf)  # [B2, Sc]
            bins_rows = _exact_dot_rhs(EXPf, mids)
            u_col = jnp.sum(
                _exact_dot_rhs(EXPf, u) * LSELf, axis=1, keepdims=True
            )  # [B2, 1]
            le = jnp.logical_and(cdf_rows <= u_col, edge_valid2)
            gt = jnp.logical_and(jnp.logical_not(le), edge_valid2)
            cdf_below = jnp.max(
                jnp.where(le, cdf_rows, -_BIG), axis=1, keepdims=True
            )
            bins_below = jnp.max(
                jnp.where(le, bins_rows, -_BIG), axis=1, keepdims=True
            )
            cdf_above = jnp.min(
                jnp.where(gt, cdf_rows, _BIG), axis=1, keepdims=True
            )
            bins_above = jnp.min(
                jnp.where(gt, bins_rows, _BIG), axis=1, keepdims=True
            )
            none_above = cdf_above >= 0.5 * _BIG
            cdf_above = jnp.where(none_above, cdf_below, cdf_above)
            bins_above = jnp.where(none_above, bins_below, bins_above)
            denom = cdf_above - cdf_below
            denom = jnp.where(denom < 1e-5, 1.0, denom)
            t = (u_col - cdf_below) / denom
            zf_col = bins_below + t * (bins_above - bins_below)  # [B2, 1]
            zf = _exact_dot_rhs(G_f, zf_col * LSELf)  # [Rp, Sf]

            # --- stable-merge ranks ---
            zc_rows = _exact_dot_rhs(EXPf, zc)  # [B2, Sc]
            rank_cf = jnp.sum(
                jnp.where(zc_rows <= zf_col, 1.0, 0.0), axis=1, keepdims=True
            )
            zf_rows = _exact_dot_rhs(EXPf, zf)  # [B2, Sf]
            lane_f = _iota2((B2, Sf), 1).astype(jnp.float32)
            # row index within ray (b % Sf) via the lane-pick mask — a
            # [B, 1] dim-0 iota miscompiles in Mosaic (round-3 finding)
            f_idx = jnp.sum(LSELf * lane_f, axis=1, keepdims=True)
            rank_ff = jnp.sum(
                jnp.where(
                    jnp.logical_or(
                        zf_rows < zf_col,
                        jnp.logical_and(zf_rows == zf_col, lane_f < f_idx),
                    ),
                    1.0, 0.0,
                ),
                axis=1, keepdims=True,
            )
            pos_f_col = rank_cf + rank_ff  # [B2, 1] ints in f32
            pos_f = _plain_dot(G_f, pos_f_col * LSELf)  # [Rp, Sf]

            zc_col = jnp.sum(
                _exact_dot_rhs(EXPc, zc) * LSELc, axis=1, keepdims=True
            )  # [B3, 1]
            zf_rows2 = _exact_dot_rhs(EXPc, zf)  # [B3, Sf]
            rank_fc = jnp.sum(
                jnp.where(zf_rows2 < zc_col, 1.0, 0.0), axis=1, keepdims=True
            )
            pos_c_col = jnp.sum(
                LSELc * _iota2((B3, Sc), 1).astype(jnp.float32),
                axis=1, keepdims=True,
            ) + rank_fc
            pos_c = _plain_dot(G_c, pos_c_col * LSELc)  # [Rp, Sc]

            # --- scatter to sorted order (indicator matmul) ---
            z_all = _exact_dot_lhs(zc, P1) + _exact_dot_lhs(zf, P2)
            pos_all = _plain_dot(pos_c, P1) + _plain_dot(pos_f, P2)
            z_all_col = jnp.sum(
                _exact_dot_rhs(EXPs, z_all) * LSELs, axis=1, keepdims=True
            )  # [BS, 1]
            pos_all_col = jnp.sum(
                _plain_dot(EXPs, pos_all) * LSELs, axis=1, keepdims=True
            )
            ind = jnp.where(
                _iota2((BS, S), 1).astype(jnp.float32) == pos_all_col,
                1.0, 0.0,
            )
            z_m = _exact_dot_rhs(G_S, ind * z_all_col)  # [Rp, S]

            # --- dists (ray_dists semantics: diff, last 1e10, * |d|) ---
            z_next_m = _exact_dot_lhs(z_m, SL_S)
            d = jnp.where(
                _iota2((Rp, S), 1) < S - 1, z_next_m - z_m, 1e10
            ) * dn_ref[sl, :]

            if debug_stage is not None:
                # diagnostic taps (chip-vs-interpret bisection); each is
                # reshaped/padded into the [Rp, S] output window
                perm_check = _plain_dot(G_S, ind)  # [Rp, S]: all-ones iff
                # pos_all is a permutation of 0..S-1 per ray
                taps = {
                    "cdf": _exact_dot_lhs(cdf, P1),
                    "mids": _exact_dot_lhs(mids, P1),
                    "zf": _exact_dot_lhs(zf, P2),
                    "pos_c": _plain_dot(pos_c, P1),
                    "pos_f": _plain_dot(pos_f, P2),
                    "perm": perm_check,
                }
                out_z_ref[sl, :] = taps[debug_stage]
                out_d_ref[sl, :] = d
                continue
            out_z_ref[sl, :] = z_m
            out_d_ref[sl, :] = d

    return kernel


def make_fused_resample(
    num_coarse: int,
    num_fine: int,
    *,
    block_rays: int = 128,
    interpret: bool = False,
    debug_stage=None,
):
    """Returns ``resample(z_coarse [N, Sc], weights [N, Sc], u [N, Sf],
    dir_norms [N, 1]) -> (z_merged [N, S], dists [N, S])`` — the fused
    equivalent of ``hierarchical_z_vals`` (with externally supplied uniform
    draws ``u``) followed by ``ray_dists``.

    ``u`` must be the same draws the XLA path would use:
    ``jax.random.uniform(key, (N, Sf))`` for perturbed training or the
    broadcast ``linspace(0, 1, Sf)`` for deterministic eval.
    """
    Sc, Sf = int(num_coarse), int(num_fine)
    S = Sc + Sf

    # independent ray-parts per block: keep [Rp, *] tiles on the 8-sublane
    # floor, same auto rule as the other kernel families
    def _parts(R):
        for cand in (16, 8, 4, 2):
            if R % cand == 0 and R // cand >= 8:
                return cand
        return 1

    kernels = {}

    def resample(z_coarse, weights, u, dir_norms):
        N = z_coarse.shape[0]
        R = min(block_rays, N)
        pad = (-N) % R
        Np = N + pad

        def pad_rows(a, fill=0.0):
            return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)

        # padded rays get constant z = 1.0: all-equal z is benign here —
        # the tie-breaking rank arithmetic still forms a valid permutation,
        # mass falls back to the +1e-5 floor (no 0/0), and the rows are
        # sliced off below. (Strictly-ascending z is NOT required of
        # padding, only of real rays.)
        zc_in = pad_rows(z_coarse, 1.0)
        w_in = pad_rows(weights)
        u_in = pad_rows(u)
        dn_in = pad_rows(dir_norms, 1.0)

        parts = _parts(R)
        kkey = (R, parts)
        if kkey not in kernels:
            kernels[kkey] = _make_resample_kernel(
                Sc, Sf, parts, debug_stage=debug_stage
            )
        kern = kernels[kkey]

        grid = (Np // R,)

        def blk(cols):
            return pl.BlockSpec(
                (R, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            )

        out_z, out_d = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((Np, S), jnp.float32),
                jax.ShapeDtypeStruct((Np, S), jnp.float32),
            ),
            grid=grid,
            in_specs=[blk(Sc), blk(Sc), blk(Sf), blk(1)],
            out_specs=(blk(S), blk(S)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(zc_in, w_in, u_in, dn_in)
        return out_z[:N], out_d[:N]

    return resample
