"""Quality-regression guard: fixed-seed, fixed-iteration convergence bands.

The long-soak comparisons (docs/PERF_NOTES.md seed study) showed seed-to-seed
holdout spread of +-2.5 dB on the synthetic scene — too noisy to catch a
subtle kernel-quality regression. This guard removes the seed axis: each
training path (XLA, fused fields, combined fused loss) runs at FIXED seeds
and iteration count, where the outcome is reproducible run-to-run to well
under a dB, and is checked against recorded bands in
``docs/QUALITY_BANDS.json``.

With ``--seeds 0,1,2`` each path runs at every listed seed and the band is
formed around the MEAN with the recorded per-seed values kept alongside —
this is what separates a systematic path-quality deficit from single-seed
noise (VERDICT r3 item 4: one seed cannot distinguish a ~0.9 dB path gap
from the +-2.5 dB seed spread; three matched seeds can).

    python tools/quality_guard.py                 # run all paths, PASS/FAIL
    python tools/quality_guard.py --paths fused_loss
    python tools/quality_guard.py --seeds 0,1,2 --record   # re-measure bands

Run on the TPU (bands are chip numbers; CPU would both diverge slightly and
take hours). Wired as ``make quality-guard``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "QUALITY_BANDS.json",
)
ALL_PATHS = ("xla", "fused", "fused_loss")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--paths", default=",".join(ALL_PATHS),
                   help="comma-separated subset of: xla,fused,fused_loss")
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--seeds", default=None,
                   help="comma-separated seeds (default: the recorded "
                   "bands' seeds; each path runs at every seed)")
    p.add_argument("--seed", type=int, default=None,
                   help="single-seed alias for --seeds")
    p.add_argument("--record", action="store_true",
                   help="measure and REWRITE the stored bands instead of "
                   "checking against them")
    args = p.parse_args()

    from tools.convergence_check import run_convergence

    with open(BANDS_PATH) as f:
        spec = json.load(f)

    if args.seeds is not None:
        seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    elif args.seed is not None:
        seeds = [args.seed]
    else:
        seeds = list(spec.get("seeds", [spec.get("seed", 0)]))

    paths = [s.strip() for s in args.paths.split(",") if s.strip()]
    ok = True
    for path in paths:
        per_seed = {}
        for seed in seeds:
            psnr = run_convergence(
                path=path, iters=args.iters, seed=seed, quiet=True
            )
            per_seed[str(seed)] = round(psnr, 3)
            print(f"  {path} seed {seed}: {psnr:.2f} dB", flush=True)
        mean = sum(per_seed.values()) / len(per_seed)
        spread = max(per_seed.values()) - min(per_seed.values())
        if args.record:
            spec["bands"][path] = {
                "min_db": round(mean - spec["tolerance_db"], 2),
                "max_db": round(mean + spec["tolerance_db"], 2),
                "measured_db": round(mean, 2),
                "per_seed_db": per_seed,
                "spread_db": round(spread, 2),
            }
            print(f"RECORD {path}: mean {mean:.2f} dB over seeds "
                  f"{sorted(per_seed)} (spread {spread:.2f})")
            continue
        band = spec["bands"][path]
        if band["measured_db"] is None:
            print(f"FAIL {path}: no recorded band — run with --record first")
            ok = False
            continue
        good = band["min_db"] <= mean <= band["max_db"]
        ok &= good
        print(
            f"{'PASS' if good else 'FAIL'} {path}: mean {mean:.2f} dB over "
            f"{len(per_seed)} seed(s) (band [{band['min_db']}, "
            f"{band['max_db']}], recorded {band['measured_db']})",
            flush=True,
        )

    if args.record:
        spec["seeds"] = seeds
        spec.pop("seed", None)
        spec["iters"] = args.iters
        with open(BANDS_PATH, "w") as f:
            json.dump(spec, f, indent=1)
        print(f"bands written to {BANDS_PATH}")
        return 0
    print("QUALITY GUARD:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
