"""Quality-regression guard: fixed-seed, fixed-iteration convergence bands.

The long-soak comparisons (docs/PERF_NOTES.md seed study) showed seed-to-seed
holdout spread of +-2.5 dB on the synthetic scene — too noisy to catch a
subtle kernel-quality regression. This guard removes the seed axis: each
training path (XLA, fused fields, combined fused loss) runs at a FIXED seed
and iteration count, where the outcome is reproducible run-to-run to well
under a dB, and is checked against a recorded band in
``docs/QUALITY_BANDS.json``.

    python tools/quality_guard.py                 # run all paths, PASS/FAIL
    python tools/quality_guard.py --paths fused_loss
    python tools/quality_guard.py --record        # re-measure + rewrite bands

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
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--record", action="store_true",
                   help="measure and REWRITE the stored bands instead of "
                   "checking against them")
    args = p.parse_args()

    from tools.convergence_check import run_convergence

    with open(BANDS_PATH) as f:
        spec = json.load(f)

    paths = [s.strip() for s in args.paths.split(",") if s.strip()]
    results = {}
    ok = True
    for path in paths:
        psnr = run_convergence(
            path=path, iters=args.iters, seed=args.seed, quiet=True
        )
        results[path] = psnr
        if args.record:
            spec["bands"][path] = {
                "min_db": round(psnr - spec["tolerance_db"], 2),
                "max_db": round(psnr + spec["tolerance_db"], 2),
                "measured_db": round(psnr, 2),
            }
            print(f"RECORD {path}: {psnr:.2f} dB")
            continue
        band = spec["bands"][path]
        if band["measured_db"] is None:
            print(f"FAIL {path}: no recorded band — run with --record first")
            ok = False
            continue
        good = band["min_db"] <= psnr <= band["max_db"]
        ok &= good
        print(
            f"{'PASS' if good else 'FAIL'} {path}: {psnr:.2f} dB "
            f"(band [{band['min_db']}, {band['max_db']}], "
            f"recorded {band['measured_db']})",
            flush=True,
        )

    if args.record:
        spec["seed"] = args.seed
        spec["iters"] = args.iters
        with open(BANDS_PATH, "w") as f:
            json.dump(spec, f, indent=1)
        print(f"bands written to {BANDS_PATH}")
        return 0
    print("QUALITY GUARD:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
