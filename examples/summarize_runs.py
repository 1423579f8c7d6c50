"""Summarize all runs/ result.csv files: best energy, gap to FCI, timings.

Usage: python examples/summarize_runs.py [runs_root]
"""

import os
import sys

from anqs_quantum_chemistry_tpu.experiments.processing import (
    CHEMICAL_ACCURACY,
    load_results,
    time_to_chemical_accuracy,
)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs"
    df = load_results(root)
    if df.empty:
        print(f"no result.csv found under {root}")
        return
    for run_dir, sub in df.groupby("run_dir"):
        best = sub["energy"].min()
        iters = len(sub)
        rate = (
            sub["wall_time"].iloc[-1] / max(iters - 1, 1)
            if "wall_time" in sub
            else float("nan")
        )
        print(
            f"{run_dir}: {iters} iters, best E {best:.6f}, "
            f"{rate * 1000:.1f} ms/iter"
        )


if __name__ == "__main__":
    main()
