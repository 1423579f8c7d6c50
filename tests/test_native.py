"""C++ Slater-Condon builder vs the pure-Python oracle."""

import numpy as np
import pytest
import scipy.sparse

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem.native import sparse_hamiltonian_native


def test_native_matches_python():
    mol = Molecule.create(MolConfig(name="LiH", basis="sto-3g"),
                          mols_dir="mols")
    dets = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    coo = sparse_hamiltonian_native(
        np.asarray(dets, np.uint64), mol.h1, mol.v
    )
    if coo is None:
        pytest.skip("no native toolchain")
    h_nat = scipy.sparse.csr_matrix(
        (coo[2], (coo[0], coo[1])), shape=(len(dets), len(dets))
    )
    h_py = fci_mod.sparse_hamiltonian(dets, mol.h1, mol.v, use_native=False)
    assert abs(h_py - h_nat).max() < 1e-12
    # Ground state agreement through eigsh.
    w_nat = scipy.sparse.linalg.eigsh(h_nat, k=1, which="SA")[0][0]
    w_py = scipy.sparse.linalg.eigsh(h_py, k=1, which="SA")[0][0]
    assert abs(w_nat - w_py) < 1e-9
