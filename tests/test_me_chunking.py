"""Matrix-element chunking (lax.map path) must match the unchunked result."""

import numpy as np
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.observables import PauliEngine
from anqs_quantum_chemistry_tpu.ops import bits as bitops


def test_chunked_matrix_elements_match():
    mol = Molecule.create(MolConfig(name="LiH", basis="sto-3g"),
                          mols_dir="mols")
    dets = fci_mod.sector_determinants(mol.qubit_num, 2, 2)[:100]
    bits = np.array(
        [[(d >> i) & 1 for i in range(mol.qubit_num)] for d in dets]
    )
    words = bitops.pack(jnp.asarray(bits))
    full = np.asarray(PauliEngine(mol.qubit_ham).matrix_elements(words))
    chunked = np.asarray(
        PauliEngine(mol.qubit_ham, me_chunk=32).matrix_elements(words)
    )
    np.testing.assert_allclose(full, chunked, atol=1e-6)
