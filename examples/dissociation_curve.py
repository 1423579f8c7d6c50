"""N2/STO-3G dissociation curve: VMC vs HF/CISD/FCI at stretched geometries.

Config 3 of the BASELINE.md ladder (strong correlation regime: HF and
CISD degrade as the triple bond stretches; the ANQS must track FCI).
Uses the winning N2 recipe (qpq=10, grad clip, SR top-50) with exact
sector summation.

Usage: python examples/dissociation_curve.py [n_points] [iters]
Writes runs/n2_dissociation.csv.
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

    rows = []
    for r in lengths:
        t0 = time.perf_counter()
        mol = Molecule.create(
            MolConfig(
                name="N2",
                basis="sto-3g",
                geometry=GeometryConfig(type="linear",
                                        bond_length=float(r)),
            ),
            mols_dir="mols",
        )
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
            run_dir=f"runs/n2_r{r:.3f}",
        )
        _, _, history, best = vmc.run(iter_num=iters, steps_per_call=25,
                                      checkpoint_every=None)
        rows.append((r, mol.hf_energy, mol.cisd_energy, mol.fci_energy,
                     best["energy"]))
        print(
            f"r={r:.3f}  HF {mol.hf_energy:.5f}  FCI {mol.fci_energy:.5f}"
            f"  VMC {best['energy']:.5f}"
            f"  gap {(best['energy'] - mol.fci_energy) * 1000:+.2f} mHa"
            f"  [{time.perf_counter() - t0:.0f}s]",
            flush=True,
        )

    os.makedirs("runs", exist_ok=True)
    np.savetxt(
        "runs/n2_dissociation.csv",
        np.array(rows, dtype=float),
        header="r_angstrom,hf,cisd,fci,vmc",
        delimiter=",",
    )


if __name__ == "__main__":
    main()
