"""N2/STO-3G dissociation curve: VMC vs HF/CISD/FCI at stretched geometries.

Config 3 of the BASELINE.md ladder (strong correlation regime: HF and
CISD degrade as the triple bond stretches; the ANQS must track FCI).
Uses the winning N2 recipe (qpq=10, grad clip, SR top-50) with exact
sector summation.

Usage: python examples/dissociation_curve.py [n_points] [iters]
Writes runs/n2_dissociation.csv (one row appended per finished point).

Crash-resilient: each point's run dir carries a FINISHED marker once its
iteration budget completes (the series-runner bookkeeping of
experiments/series.py); re-running the script skips finished points and
re-trains interrupted ones, so an interrupted sweep resumes where it
left off (reference: nqs/nqs/energy_opt_exp_sandbox.py:50-121).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import (
    GeometryConfig,
    Molecule,
    MolConfig,
)
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    lengths = np.linspace(0.9, 2.0, n_points)

    os.makedirs("runs", exist_ok=True)
    summary = "runs/n2_dissociation.csv"
    if not os.path.exists(summary):
        with open(summary, "w") as f:
            # No '#' prefix: np.genfromtxt(names=True) must read this row.
            f.write("r_angstrom,hf,cisd,fci,vmc\n")

    for r in lengths:
        t0 = time.perf_counter()
        run_dir = f"runs/n2_r{r:.3f}"
        marker = os.path.join(run_dir, "FINISHED")
        mol = Molecule.create(
            MolConfig(
                name="N2",
                basis="sto-3g",
                geometry=GeometryConfig(type="linear",
                                        bond_length=float(r)),
            ),
            mols_dir="mols",
        )
        if os.path.exists(marker):
            best_e, _ = np.load(os.path.join(run_dir, "best_energy.npy"))
            print(f"r={r:.3f}  skipped (FINISHED, best {best_e:.5f})",
                  flush=True)
            continue
        vmc = VMC(
            mol,
            VMCConfig(
                sampling_mode="exact",
                sr=SRConfig(max_indices_num=50),
                lr=1e-3,
                grad_clip_norm=1.0,
                qubit_per_qudit=10,
            ),
            AnqsConfig(hidden_widths=(512,)),
            run_dir=run_dir,
        )
        _, _, history, best = vmc.run(iter_num=iters, steps_per_call=25,
                                      checkpoint_every=None)
        with open(marker, "w") as f:
            f.write(f"iters={iters}\n")
        with open(summary, "a") as f:
            f.write(f"{r},{mol.hf_energy},{mol.cisd_energy},"
                    f"{mol.fci_energy},{best['energy']}\n")
        print(
            f"r={r:.3f}  HF {mol.hf_energy:.5f}  FCI {mol.fci_energy:.5f}"
            f"  VMC {best['energy']:.5f}"
            f"  gap {(best['energy'] - mol.fci_energy) * 1000:+.2f} mHa"
            f"  [{time.perf_counter() - t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
