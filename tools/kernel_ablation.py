"""Timing-only ablation of the fused forward kernel's cost components.

The fwd kernel runs ~4.7 us per 1024-sample block vs ~1.6 us of pure MXU
time — this bisects where the rest goes by monkeypatching parts of the
kernel body to cheap stand-ins (results are WRONG numerically; timing
only):

  baseline   : the real kernel
  no_sin     : positional encoding without the sin evaluation
  matmul_only: biases/relu/casts removed — bare dot chain

Usage: python tools/kernel_ablation.py
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp

import dexnerf_tpu.ops.fused_mlp as fm

N, S = 4096, 64
STEPS = 30
REPEATS = 3

_real_pe = fm._pe_in_kernel
_real_fwd = fm._forward_block


def _pe_no_sin(x, num_freq, include_input, padded_dim):
    out = _real_pe(x, num_freq, include_input, padded_dim)
    # same shapes/layout work minus the transcendental: reuse the projector
    # matmul, skip sin by returning the pre-activation tile
    import jax as _jax
    import jax.numpy as _jnp

    r = _jax.lax.broadcasted_iota(_jnp.int32, (3, padded_dim), 0)
    P = _jnp.where(r < 3, 1.0, 0.0)[:, :padded_dim] * 0.01
    return _jax.lax.dot_general(
        x, P, (((1,), (0,)), ((), ())),
        preferred_element_type=_jnp.float32,
    )


def _fwd_matmul_only(model, mats, biases, xyz, dir_enc, compute_dtype,
                     keep_activations=False):
    skip = set(fm._skip_indices(model))
    num_trunk = model.num_layers - 1
    cd = compute_dtype
    xyz_op = xyz.astype(cd)
    mi = 0
    h = fm._dot(xyz_op, mats[mi][:], jnp.float32)
    mi += 1
    for i in range(num_trunk):
        if i in skip:
            h = fm._dot(h.astype(cd), mats[mi][:], jnp.float32) + fm._dot(
                xyz_op, mats[mi + 1][:], jnp.float32
            )
            mi += 2
        else:
            h = fm._dot(h.astype(cd), mats[mi][:], jnp.float32)
            mi += 1
    li = model.num_layers
    feat = fm._dot(h.astype(cd), mats[mi][:], jnp.float32)
    alpha4 = fm._dot(h, mats[mi + 1][:], jnp.float32)
    y = fm._dot(feat.astype(cd), mats[mi + 2][:], jnp.float32) + fm._dot(
        dir_enc.astype(cd), mats[mi + 3][:], jnp.float32
    )
    out = fm._dot(y, mats[mi + 4][:], jnp.float32) + alpha4
    return out


def time_variant(name):
    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.ones((1, in_dim)))
    pts0 = jax.random.normal(jax.random.fold_in(key, 1), (N, S, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    field = fm.make_fused_flexible_field(
        model, block_samples=1024, compute_dtype=jnp.bfloat16
    )

    @jax.jit
    def chained(pts):
        raw = field(params, pts, dirs)
        return pts + 1e-12 * raw[..., :3]

    pts = chained(pts0)
    jax.block_until_ready(pts)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        cur = pts
        for _ in range(STEPS):
            cur = chained(cur)
        jax.block_until_ready(cur)
        best = min(best, (time.time() - t0) / STEPS)
    print(f"RESULT {name}: {best*1e3:.2f} ms / {N*S} samples", flush=True)


def main():
    print("--- baseline", flush=True)
    time_variant("baseline")
    print("--- no_sin", flush=True)
    fm._pe_in_kernel = _pe_no_sin
    try:
        time_variant("no_sin")
    finally:
        fm._pe_in_kernel = _real_pe
    print("--- matmul_only", flush=True)
    fm._forward_block = _fwd_matmul_only
    try:
        time_variant("matmul_only")
    finally:
        fm._forward_block = _real_fwd


if __name__ == "__main__":
    main()
