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
    """Concatenate all result.csv under ``runs_root`` with a run_dir column."""
    frames = []
    for path in sorted(glob.glob(os.path.join(runs_root, "**", "result.csv"),
                                 recursive=True)):
        df = pd.read_csv(path)
        df["run_dir"] = os.path.dirname(path)
        frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


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
