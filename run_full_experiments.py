#!/usr/bin/env python
"""Full experiment batch runner (reference: run_full_experiments.py).

Runs the paper matrix for one or both dataset presets with resume
(``--continue`` semantics are the default: already-finished cells are
skipped via their result files).
"""

import argparse
import sys

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def check_accelerator() -> None:
    import jax

    devs = jax.devices()
    print(f"devices: {devs}")
    if devs[0].platform not in ("tpu", "gpu"):
        print("WARNING: no accelerator found; running on CPU will be slow")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="quick",
                    choices=["quick", "mnist", "cub200", "all"])
    ap.add_argument("--results-dir", default="results/full")
    ap.add_argument("--no-continue", action="store_true",
                    help="re-run cells even if result files exist")
    ap.add_argument("--full-distributions", action="store_true")
    args = ap.parse_args()

    check_accelerator()
    from multimodal_fl_security_tpu.experiments.paper import (
        run_paper_experiments,
    )

    presets = (["mnist", "cub200"] if args.preset == "all" else [args.preset])
    for preset in presets:
        print(f"=== preset: {preset} ===")
        out = run_paper_experiments(
            preset=preset,
            results_dir=f"{args.results_dir}/{preset}",
            full_distributions=args.full_distributions,
            resume=not args.no_continue,
        )
        print(out["markdown"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
