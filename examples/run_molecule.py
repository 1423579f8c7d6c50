"""Run VMC ground-state optimization for one molecule.

Usage:
    python examples/run_molecule.py [molecule] [iters] [sample_num]

Counterpart of the reference sandbox entry points
(reference: nqs/nqs/energy_opt_exp_sandbox.py:1-122), as a proper script.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "LiH"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    sample_num = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    mol = Molecule.create(MolConfig(name=name, basis="sto-3g"),
                          mols_dir="mols")
    print(f"{name}: HF {mol.hf_energy:.6f}  CISD {mol.cisd_energy}  "
          f"FCI {mol.fci_energy}  qubits {mol.qubit_num}")

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            sr=SRConfig(max_indices_num=50),
            lr=2e-3,
        ),
        AnqsConfig(hidden_widths=(512,)),
        run_dir=f"runs/{name.lower()}",
    )

    def progress(it, row):
        if it % 25 == 0:
            ref = mol.fci_energy or mol.cisd_energy or mol.hf_energy
            print(
                f"iter {it:5d}  E {row['energy']:+.6f}  "
                f"gap {row['energy'] - ref:+.2e}  "
                f"unique {int(row['unique_num'])}  "
                f"var {row['energy_var']:.2e}"
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress
    )
    ref = mol.fci_energy or mol.cisd_energy
    print(f"best energy {best['energy']:.6f} at iter {best['iter']}")
    if ref:
        gap = best["energy"] - ref
        print(f"gap to reference {gap * 1000:.3f} mHa "
              f"({'CHEMICAL ACCURACY' if gap < 1.6e-3 else 'not yet'})")


if __name__ == "__main__":
    main()
