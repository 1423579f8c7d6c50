"""Li2O plateau diagnosis: can NADE-64 represent the FCI vector at all?

Round-3 state: the reference-recipe NADE (64, 64) pilot plateaus at
93.9% of the FCI correlation (7.5 mHa) and neither LR decay (+0.07 mHa)
nor doubling the unique batch to 16384 moves it. Two hypotheses:
(a) optimization/sampling, (b) conditional capacity. The exact FCI
vector (runs/li2o_fci.npz, direct CI, res 8e-5) separates them: distill
the ansatz DIRECTLY onto the FCI amplitudes (no sampling, no VMC) and
measure the variational energy of the distilled state on the top-K
determinant support. If even supervised distillation cannot take this
architecture below ~FCI+1.6 mHa, the plateau is capacity and the next
lever is a wider/finer-factorized ansatz, not more VMC iterations.
(The FCI-distilled state is a DIAGNOSTIC, not a ladder artifact.)

Usage: python tools/li2o_capacity_probe.py [K] [iters] [hidden] [qpq]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.direct_ci import (
    ci_strings,
    interleave_parity,
)
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.pretrain import (
    amplitude_targets_from_coefs,
    pack_dets,
    pretrain,
)


def main():
    k_top = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    hidden = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    qpq = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    n_orb = mol.qubit_num // 2
    d = np.load("runs/li2o_fci.npz")
    coeffs = np.asarray(d["coeffs"], np.float64)  # (S_a, S_b) string basis
    e_fci = float(d["energy"])
    str_a = ci_strings(n_orb, mol.n_alpha)
    str_b = (
        str_a if mol.n_beta == mol.n_alpha
        else ci_strings(n_orb, mol.n_beta)
    )
    par = interleave_parity(str_a, str_b, n_orb).astype(np.float64)
    c_int = coeffs * par  # interleaved-convention amplitudes

    # Top-K support by |c|.
    flat = np.abs(c_int).ravel()
    order = np.argpartition(flat, len(flat) - k_top)[-k_top:]
    mass = float(np.sum(flat[order] ** 2) / np.sum(flat**2))
    ia, ib = np.unravel_index(order, c_int.shape)

    # Interleaved spin-orbital encoding (even bits alpha) -- spread the
    # string bits o -> 2o (alpha) / 2o+1 (beta).
    def spread(x, shift):
        out = np.zeros_like(x, dtype=np.uint64)
        for o in range(n_orb):
            out |= ((x >> np.uint64(o)) & np.uint64(1)) << np.uint64(
                2 * o + shift
            )
        return out

    dets = spread(str_a[ia].astype(np.uint64), 0) | spread(
        str_b[ib].astype(np.uint64), 1
    )
    c_sel = c_int[ia, ib]
    srt = np.argsort(dets)
    dets, c_sel = dets[srt], c_sel[srt]
    print(
        f"top-{k_top} support: |c|^2 mass {mass:.8f} "
        f"(FCI {e_fci:.6f}, HF {mol.hf_energy:.6f})", flush=True,
    )

    # Truncated-support variational energies (exact sparse H over K dets).
    t0 = time.perf_counter()
    h = fci_mod.sparse_hamiltonian([int(x) for x in dets], mol.h1, mol.v)
    print(f"H({k_top}) built in {time.perf_counter() - t0:.0f}s "
          f"(nnz {h.nnz})", flush=True)

    def rayleigh(c):
        c = np.asarray(c, np.float64)
        return float(c @ (h @ c) / (c @ c)) + mol.e_nuc

    e_fci_k = rayleigh(c_sel)
    print(
        f"FCI truncated to top-{k_top}: {e_fci_k:.6f} "
        f"(+{1e3 * (e_fci_k - e_fci):.3f} mHa vs FCI) "
        f"-- the support-quality floor", flush=True,
    )

    # Distill the pilot ansatz onto the exact amplitudes.
    vmc = VMC(
        mol,
        VMCConfig(sample_num=1024, sampling_mode="gumbel",
                  qubit_per_qudit=qpq, seed=0),
        AnqsConfig(net_type="nade", hidden_widths=(hidden, hidden),
                   aux_hidden_widths=(hidden, hidden)),
    )
    probs, phases = amplitude_targets_from_coefs(c_sel)
    words = pack_dets([int(x) for x in dets], mol.qubit_num)
    params, _, _ = vmc.init_state()
    import jax

    t0 = time.perf_counter()

    def plog(row):
        print(f"  distill {row['iter']:5d} loss {row['loss']:.6f} "
              f"ce {row['cross_entropy']:.6f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    stages = (
        (iters * 3 // 8, 1e-3),
        (iters // 4, 3e-4),
        (iters // 4, 1e-4),
        (iters // 8, 3e-5),
    )
    for st_iters, lr in stages:
        params, _ = pretrain(
            vmc.anqs, params, words, probs, phases,
            jax.random.PRNGKey(0), iters=st_iters, lr=lr, batch=8192,
            on_log=plog,
        )

    la, ph = vmc.anqs.log_psi(params, words)
    la = np.asarray(la, np.float64)
    amp = np.exp(la - la.max()) * np.cos(np.asarray(ph, np.float64))
    e_nade = rayleigh(amp)
    print(
        f"NADE-{hidden} qpq={qpq} distilled on exact FCI amplitudes: "
        f"E(top-{k_top} support) = {e_nade:.6f} "
        f"(+{1e3 * (e_nade - e_fci):.3f} mHa vs FCI; support floor "
        f"+{1e3 * (e_fci_k - e_fci):.3f}); overlap with truncated FCI "
        f"{abs(np.dot(amp / np.linalg.norm(amp), c_sel / np.linalg.norm(c_sel))):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
