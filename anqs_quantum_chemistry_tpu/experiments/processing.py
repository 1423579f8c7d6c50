"""Result harvesting and plotting across experiment trees.

Counterpart of the reference processing layer (reference: nqs/nqs/
applications/quantum_chemistry/experiments/processing/plotting.py:25-232):
reads ``result.csv`` files back from run directories, concatenates seeds, and
plots optimization energy against the FCI reference with the chemical-accuracy
band.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np
import pandas as pd

CHEMICAL_ACCURACY = 1.6e-3  # Ha (reference: .../quantum_chemistry/__init__.py:18)


def load_results(runs_root: str) -> pd.DataFrame:
    """Concatenate all result.csv[.gz] under ``runs_root`` with a
    run_dir column (gz-compressed archives of finished runs load the
    same way)."""
    frames = []
    seen = set()
    for pattern in ("result.csv", "result.csv.gz"):
        for path in sorted(
            glob.glob(os.path.join(runs_root, "**", pattern),
                      recursive=True)
        ):
            run_dir = os.path.dirname(path)
            if run_dir in seen:
                continue
            seen.add(run_dir)
            df = pd.read_csv(path)
            df["run_dir"] = run_dir
            frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def harvest(runs_root: str) -> pd.DataFrame:
    """One summary row per run directory across an experiment tree.

    Counterpart of the reference's cross-experiment harvesting
    (reference: .../experiments/processing/plotting.py:25-118, which
    walks experiment trees and concatenates seeds): flattens each run's
    config.json next to its trajectory endpoints (best/final energy,
    iterations, wall time, final unbiased full energy when recorded, and
    the f64 re-validation result if tools/revalidate_full_energy.py was
    run on it).
    """
    import json

    rows = []
    df_all = load_results(runs_root)
    if df_all.empty:
        return pd.DataFrame()
    for run_dir, df in df_all.groupby("run_dir"):
        row = {"run_dir": run_dir, "iters": len(df)}
        cfg_path = os.path.join(run_dir, "config.json")
        if os.path.exists(cfg_path):
            cfg = json.load(open(cfg_path))
            for k, v in cfg.items():
                if isinstance(v, (int, float, str, bool, type(None))):
                    row[f"cfg.{k}"] = v
        row["best_energy"] = float(df["energy"].min())
        row["final_energy"] = float(df["energy"].iloc[-1])
        if "wall_time" in df:
            row["wall_time"] = float(df["wall_time"].iloc[-1])
        if "full_energy" in df:
            fe = df["full_energy"].dropna()
            if len(fe):
                row["final_full_energy"] = float(fe.iloc[-1])
        reval = os.path.join(run_dir, "full_energy_revalidation.json")
        if os.path.exists(reval):
            r = json.load(open(reval))
            row["full_energy_f64"] = r.get("full_energy_f64")
            row["gap_to_fci_mHa"] = r.get("gap_to_fci_mHa")
        rows.append(row)
    return pd.DataFrame(rows)


def aggregate_seeds(
    summary: pd.DataFrame, group_keys: Optional[List[str]] = None
) -> pd.DataFrame:
    """Collapse runs differing only by cfg.seed: best/mean/std of the
    best energy per config group (the reference concatenates seed
    directories the same way, plotting.py:60-118)."""
    if summary.empty:
        return summary
    if group_keys is None:
        group_keys = [
            c for c in summary.columns
            if c.startswith("cfg.") and c != "cfg.seed"
            and summary[c].nunique(dropna=False) > 0
        ]
    agg = summary.groupby(group_keys, dropna=False).agg(
        n_seeds=("run_dir", "count"),
        best_energy=("best_energy", "min"),
        mean_best_energy=("best_energy", "mean"),
        std_best_energy=("best_energy", "std"),
    )
    return agg.reset_index()


def time_to_chemical_accuracy(
    df: pd.DataFrame, fci_energy: float
) -> Optional[float]:
    """First wall-time at which the running-best energy enters the band."""
    best = df["energy"].cummin()
    hit = np.nonzero((best - fci_energy).values < CHEMICAL_ACCURACY)[0]
    if len(hit) == 0:
        return None
    return float(df["wall_time"].iloc[hit[0]])


def plot_energy_vs_reference(
    df: pd.DataFrame,
    fci_energy: float,
    hf_energy: Optional[float] = None,
    cisd_energy: Optional[float] = None,
    ccsd_energy: Optional[float] = None,
    out_path: Optional[str] = None,
    logy: bool = True,
):
    """Energy - E_FCI vs iteration with the chemical-accuracy band."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.grid(alpha=0.3)
    for run_dir, sub in df.groupby("run_dir"):
        ax.plot(
            sub["iter_idx"],
            sub["energy"] - fci_energy,
            lw=1,
            label=os.path.basename(run_dir),
        )
    ax.axhspan(0, CHEMICAL_ACCURACY, color="grey", alpha=0.35,
               label="chemical accuracy")
    for name, e in [("HF", hf_energy), ("CISD", cisd_energy),
                    ("CCSD", ccsd_energy)]:
        if e is not None:
            ax.axhline(e - fci_energy, ls="--", lw=1, label=name)
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel(r"$E - E_{FCI}$ (Ha)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    return fig, ax


def plot_dissociation_curve(csv_path: str, out_path: Optional[str] = None):
    """HF/CISD/FCI/VMC energies vs bond length + the VMC-FCI gap panel
    (the dissociation-curve artifact of BASELINE.md ladder config 3;
    reference plots the same comparison in processing/plotting.py)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    data = np.genfromtxt(csv_path, delimiter=",", names=True)
    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(7, 6), sharex=True,
        gridspec_kw={"height_ratios": [3, 1]},
    )
    ax.grid(alpha=0.3)
    ax.plot(data["r_angstrom"], data["hf"], "s--", lw=1, label="HF")
    ax.plot(data["r_angstrom"], data["cisd"], "^--", lw=1, label="CISD")
    ax.plot(data["r_angstrom"], data["fci"], "k-", lw=1.5, label="FCI")
    ax.plot(data["r_angstrom"], data["vmc"], "o", ms=5, label="ANQS VMC")
    ax.set_ylabel("energy (Ha)")
    ax.legend(fontsize=9)

    ax2.grid(alpha=0.3)
    gap_mha = (data["vmc"] - data["fci"]) * 1e3
    ax2.axhspan(0, CHEMICAL_ACCURACY * 1e3, color="grey", alpha=0.35,
                label="chemical accuracy")
    ax2.plot(data["r_angstrom"], gap_mha, "o-", ms=5)
    ax2.set_xlabel("bond length (angstrom)")
    ax2.set_ylabel(r"$E_{VMC} - E_{FCI}$ (mHa)")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=150)
    return fig
