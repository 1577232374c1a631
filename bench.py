"""Headline benchmark: hierarchical NeRF training throughput (rays/sec/chip).

Runs the flagship lego.yml-scale configuration (FlexibleNeRFModel 8x128,
10/4 frequency encodings, 64 coarse + 64 fine samples/ray, Adam + exp decay)
as full jitted train steps (render + loss + grads + update) on synthetic
posed views, and reports sustained rays/sec on one chip.

Baseline: the reference (nerf-pytorch on an RTX 2080 Ti, the deployment GPU
in job-example.yaml) trains 1024-ray iterations of the same hierarchical
pipeline; from the repo's own "few hours to a day" for 200k iterations
(README:59) that is ~7-18 it/s => ~12.5k rays/s mid-estimate. vs_baseline
reports our throughput against BASELINE_RAYS_PER_SEC = 12500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 12_500.0  # estimated reference on RTX 2080 Ti (see above)

# Headline batch: throughput saturates with batch (PERF_NOTES
# batch-scaling tables: 390.3k rays/s @16384, 396.2k @32768, 403.4k
# @65536 in round 3); the headline records the chip's saturated
# training throughput. Note the shipped EXAMPLE configs train at 8192
# rays/batch — sized for quality on the small demo scenes, not for
# chip saturation; large scenes should raise num_random_rays toward
# the saturating batch (rays are i.i.d., so batch size is a free
# throughput knob modulo lr retuning). Rounds 1-2 pinned 4096;
# per-step sync timings in docs use 4096/16384 — scale by the tables
# when comparing.
import os as _os

BATCH = int(_os.environ.get("DEXNERF_BENCH_BATCH", "65536"))
WARMUP = 3
# The remote tunnel costs ~26 ms per host readback (round-3 probe:
# tools/launch_overhead_probe.py) and ~3 ms/step of fixed dispatch-side
# overhead; production amortizes both with nerf.train.steps_per_call
# (lax.scan of optimizer steps per dispatch, train/step.py) and
# print_every-spaced readbacks. The bench records the same product path:
# 50 optimizer steps per timing block, one readback per block.
STEPS_PER_CALL = 25
DISPATCHES = 2  # per timing block -> 50 optimizer steps/block
REPEATS = 4  # timing blocks; best block wins (the remote TPU tunnel can
             # stall transiently — min filters those out)


def _probe_backend(timeout_sec: float = 300.0) -> None:
    """Bounded backend probe. The axon tunnel can be down or wedged; a
    bench that hangs forever would stall the round driver. If the first
    trivial device op doesn't complete in ``timeout_sec``, emit a
    diagnosable JSON line and exit nonzero instead of hanging."""
    import os
    import sys
    import threading

    done = threading.Event()
    err: list = []

    def probe():
        try:
            jax.devices()
            jnp.ones((8,)).sum().block_until_ready()
        except Exception as e:  # fail FAST on a raising backend too
            err.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_sec) or err:
        print(
            json.dumps(
                {
                    "metric": "train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": (
                        err[0]
                        if err
                        else (
                            f"device backend unresponsive after "
                            f"{timeout_sec:.0f}s (TPU tunnel down or chip "
                            "claimed by another process)"
                        )
                    ),
                }
            )
        )
        sys.stdout.flush()
        os._exit(3)


def main():
    _probe_backend()
    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import init_train_state, make_optimizer, make_train_step

    enc_xyz, enc_dir = 10, 4
    settings = RenderSettings(
        num_coarse=64,
        num_fine=64,
        perturb=True,
        radiance_field_noise_std=0.2,
        num_encoding_fn_xyz=enc_xyz,
        num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=8,
        hidden_size=128,
        skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz,
        num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }

    # synthetic 400x400 views (lego-scale frame), on-device ray store
    rng = np.random.RandomState(0)
    images = rng.rand(4, 400, 400, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = 4.0
    store = build_ray_store(images, poses, [400, 400, 555.0], 2.0, 6.0)

    tx = make_optimizer(5e-3)
    # host-side master copy: the donated train step consumes its buffers,
    # so every probe attempt below starts from a fresh device state
    params_host = jax.device_get(params)
    # The product TPU path (cfg.nerf.use_pallas): the combined loss+grads
    # Pallas kernel — PE→MLP→compositing→MSE and every parameter gradient in
    # ONE program per pass, so the forward never recomputes in the backward
    # (docs/PERF_NOTES.md round 2). Falls back to the separate fused-field
    # kernels, then to plain XLA, off-TPU or if a kernel fails to build.
    def build_step(path):
        kw = {}
        if path == "fused_loss":
            from dexnerf_tpu.ops import make_fused_train_loss

            kw["fused_loss"] = make_fused_train_loss(
                model, model, settings,
                block_samples=8192,
                compute_dtype=jnp.bfloat16,
                dw_dtype=jnp.bfloat16,
            )
        elif path == "fused_fields":
            from dexnerf_tpu.ops import make_fused_flexible_field_train

            def fused():
                return make_fused_flexible_field_train(
                    model,
                    block_samples=4096,
                    block_samples_bwd=4096,
                    compute_dtype=jnp.bfloat16,
                    dw_dtype=jnp.bfloat16,
                )

            kw["coarse_field"], kw["fine_field"] = fused(), fused()
        return make_train_step(
            model.apply, model.apply, tx, settings, BATCH,
            steps_per_call=STEPS_PER_CALL, **kw
        )

    # Try kernels best-first; Pallas build/compile errors only surface at
    # the first step call, so probe each path with its warmup.
    paths = ["xla"]
    if jax.default_backend() not in ("cpu",):
        paths = ["fused_loss", "fused_fields", "xla"]
    for path in paths:
        try:
            step = build_step(path)
            key = jax.random.PRNGKey(1)
            state = init_train_state(
                jax.tree.map(jnp.asarray, params_host), tx
            )
            for _ in range(WARMUP):
                key, sub = jax.random.split(key)
                state, metrics = step(state, store, sub)
            jax.block_until_ready((state.params, metrics))
            break
        except Exception as e:
            # a kernel build regression must be VISIBLE, not silently read
            # as a throughput drop: log the skip and record the path that
            # actually ran in the JSON (ADVICE r2)
            import sys
            import traceback

            print(f"bench: path {path!r} failed, falling back: {e}",
                  file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            if path == "xla":
                raise

    best_dt = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(DISPATCHES):
            key, sub = jax.random.split(key)
            state, metrics = step(state, store, sub)
        # hard sync on the step's metrics (a full-step reduction)
        final_loss = float(metrics["loss"])
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss)
        best_dt = min(best_dt, dt)

    rays_per_sec = BATCH * STEPS_PER_CALL * DISPATCHES / best_dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
                "path": path,
                "batch": BATCH,
            }
        )
    )


if __name__ == "__main__":
    main()
