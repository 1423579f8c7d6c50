"""Build + cache the C2H4 262k-det support-restricted sparse Hamiltonian.

Host-only (C++ Slater-Condon builder, chem/native.py). The CSR is the
oracle for support-restricted VMC (experiments/support_ci.support_vmc):
exact f64 local energies on the enriched support. Too large to commit;
rebuilt per machine (this script), cached at runs/c2h4_sci/h_support.npz.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import scipy.sparse

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

OUT = "runs/c2h4_sci/h_support.npz"

if os.path.exists(OUT):
    print("already cached:", OUT)
    sys.exit(0)

mol = Molecule.create(
    MolConfig(name="C2H4", basis="6-31g"), mols_dir="mols", run_fci=False
)
d = np.load("runs/c2h4_sci/target.npz")
dets = sorted(int(x) for x in d["dets"])
print(f"building restricted H: |S|={len(dets)} n_so={mol.h1.shape[0]}",
      flush=True)
t0 = time.perf_counter()
h = fci_mod.sparse_hamiltonian(dets, mol.h1, mol.v)
print(f"built in {time.perf_counter() - t0:.0f}s nnz={h.nnz}", flush=True)
scipy.sparse.save_npz(OUT, h)
print("saved", OUT, flush=True)

# Sanity: the restricted ground state must reproduce target e0.
import scipy.sparse.linalg as spla

t0 = time.perf_counter()
vals = spla.eigsh(h, k=1, which="SA", return_eigenvectors=False)
e0 = float(vals[0]) + mol.e_nuc
print(f"restricted E0 = {e0:.6f} (target {float(d['e0']):.6f}) "
      f"[{time.perf_counter() - t0:.0f}s]", flush=True)
