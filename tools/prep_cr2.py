"""Prepare Cr2/SV end-to-end (VERDICT round-2 item #9 evidence).

Builds the 84-qubit Cr2 molecule from the embedded reference SV basis
(chem/basis.py): integrals, multi-start SCF, spin-orbital transform, JW
Hamiltonian, HF determinant -- and writes a committed summary JSON so
the claim is reproducible from the repo. The npz cache itself lands in
mols/Cr2* (gitignored: ~the Hamiltonian is hundreds of MB).

Usage: python tools/prep_cr2.py
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig


def main():
    t0 = time.perf_counter()
    mol = Molecule.create(
        MolConfig(name="Cr2", basis="sv"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    dt = time.perf_counter() - t0
    ham = mol.qubit_ham
    summary = {
        "molecule": "Cr2/SV (reference run_pyscf.py:26-106 custom basis)",
        "qubits": mol.qubit_num,
        "n_electrons": mol.n_electrons,
        "sector": [mol.n_alpha, mol.n_beta],
        "hf_energy": mol.hf_energy,
        "mp2_energy": mol.mp2_energy,
        "n_terms": int(getattr(ham, "n_terms", 0) or ham.coeffs.shape[0]),
        "n_groups": int(getattr(ham, "n_groups", 0)),
        "prep_wall_seconds": dt,
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/cr2_prep_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
