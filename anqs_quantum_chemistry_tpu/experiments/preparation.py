"""Factories wiring molecules to maskers/ansatzes.

Counterpart of the reference preparation factories
(reference: nqs/nqs/applications/quantum_chemistry/experiments/preparation/
create_masker.py:27-79, create_ansatz.py:42-58).
"""

from __future__ import annotations

import numpy as np

from ..chem.molecule import Molecule
from ..symmetries import (
    Masker,
    idle_symmetry,
    particle_number_symmetry,
    spin_projection_symmetry,
    z2_symmetry,
)

ALLOWED_SYMMETRY_LEVELS = ("no_sym", "e_num", "e_num_spin", "z2")


def create_masker(
    mol: Molecule, symmetry_level: str = "e_num_spin", perm=None
) -> Masker:
    """Symmetry level -> masker; Z2 reference values measured on the HF
    determinant (reference create_masker.py:36-50). ``perm`` relabels
    qubits (new qubit i = original spin-orbital perm[i]) consistently
    with ``chem.jw.permute_qubits_hamiltonian``."""
    n = mol.qubit_num
    if symmetry_level == "no_sym":
        return Masker([idle_symmetry(n)])
    syms = [particle_number_symmetry(n, mol.n_electrons)]
    if symmetry_level in ("e_num_spin", "z2"):
        syms.append(
            spin_projection_symmetry(
                n, mol.n_alpha - mol.n_beta, perm=perm
            )
        )
    if symmetry_level == "z2":
        for g_idx, g in enumerate(mol.z2_generators):
            if perm is not None:
                g = np.asarray(g)[np.asarray(perm)]
            g_int = sum(1 << i for i in range(n) if g[i])
            hf_det = mol.hf_det
            if perm is not None:
                from ..chem.jw import permute_det

                hf_det = permute_det(hf_det, perm)
            ref = -1 if bin(hf_det & g_int).count("1") % 2 else 1
            # Skip generators implied by N/Sz (they'd be redundant ordinals):
            # total parity and alpha-parity are fixed by (N, Sz) already.
            orig = list(range(n)) if perm is None else list(perm)
            alpha_mask = sum(1 << i for i in range(n) if orig[i] % 2 == 0)
            beta_mask = sum(1 << i for i in range(n) if orig[i] % 2 == 1)
            if g_int in (alpha_mask, beta_mask, alpha_mask | beta_mask):
                continue
            syms.append(z2_symmetry(g, ref, name=f"z2_{g_idx}"))
    return Masker(syms)
