"""Li2O/STO-3G: the reference's documented toy-model workload at 30 qubits.

Counterpart of the reference Colab notebook (colab_toy_model.ipynb,
README.md:6-10): Li2O/STO-3G, 1e4 unique samples, SR top-50, 500 iterations
(~0.36 s/iter on the reference's Colab GPU). The 30-qubit regime exercises
the hash-bucket membership path (the direct-address table caps at 22).

Usage: python examples/li2o_toy_model.py [iters] [sample_num]
Writes runs/li2o/result.csv.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    # 8192 unique samples (the reference toy uses 1e4): power-of-two batch
    # keeps XLA tiling clean and shares the compile cache with the
    # membership timing harness (tools/bench_li2o_membership.py).
    sample_num = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False
    )
    ref = mol.ccsd_t_energy or mol.cisd_energy or mol.hf_energy
    print(
        f"Li2O: {mol.qubit_num} qubits, ndet {mol.fci_ndet:,}; "
        f"HF {mol.hf_energy:.6f} CISD {mol.cisd_energy} "
        f"CCSD(T) {mol.ccsd_t_energy}",
        flush=True,
    )

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            # The winning Li2O recipe (see runs/li2o config.json): warm
            # 3e-3 decaying to 3e-4 + global-norm clip; a flat 1e-3 with
            # no clip plateaus ~120 mHa above HF.
            lr=3e-3,
            lr_schedule=((0, 3e-3), (1200, 1e-3), (2400, 3e-4)),
            grad_clip_norm=1.0,
            sr=SRConfig(max_indices_num=50),
            seed=0,
        ),
        AnqsConfig(hidden_widths=(512,)),
        run_dir="runs/li2o",
    )

    t0 = time.perf_counter()
    steady = {}  # first-window end -> excludes compile/init warmup

    def progress(it, row):
        if it >= 25 and not steady:
            steady.update(t=time.perf_counter(), it=it)
        if it % 50 == 0:
            print(
                f"iter {it:5d} E {row['energy']:+.6f} "
                f"gap-to-ref {row['energy'] - ref:+.3e} "
                f"unique {int(row['unique_num'])} "
                f"found {int(row['found_pairs'])} "
                f"[{time.perf_counter() - t0:.0f}s]",
                flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=None,
        steps_per_call=25,
    )
    per_iter = (time.perf_counter() - steady["t"]) / max(
        1, len(history) - steady["it"] - 1
    )
    print(
        f"best {best['energy']:.6f} at iter {best['iter']} "
        f"({per_iter:.3f} s/iter steady-state, compile/init excluded; "
        f"reference Colab toy model: ~0.36 s/iter)"
    )


if __name__ == "__main__":
    main()
