"""N2/STO-3G to chemical accuracy: the BASELINE.md north-star run.

Usage: python examples/n2_convergence.py [iters] [sample_num]
Writes runs/n2/result.csv; prints progress and the final verdict.
"""

import sys
import time

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    sample_num = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    mol = Molecule.create(MolConfig(name="N2", basis="sto-3g"),
                          mols_dir="mols")
    print(f"N2: HF {mol.hf_energy:.6f} CISD {mol.cisd_energy:.6f} "
          f"FCI {mol.fci_energy:.6f} ndet {mol.fci_ndet}")

    # Config kept identical to bench.py (shared compile cache; compiles cost
    # tens of minutes here). LR decay via resume + a second run if needed.
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=5,
            lr=1e-2,
            sr=SRConfig(max_indices_num=50),
        ),
        AnqsConfig(hidden_widths=(512,)),
        run_dir="runs/n2",
    )

    t0 = time.perf_counter()
    state = {"best": 1e9, "hit": None}

    def progress(it, row):
        gap = row["energy"] - mol.fci_energy
        if row["energy"] < state["best"]:
            state["best"] = row["energy"]
            if gap < 1.6e-3 and state["hit"] is None:
                state["hit"] = (it, time.perf_counter() - t0)
                print(f"*** chemical accuracy at iter {it} "
                      f"({state['hit'][1]:.0f}s) ***")
        if it % 200 == 0:
            print(f"iter {it:6d} E {row['energy']:+.6f} "
                  f"best-gap {state['best'] - mol.fci_energy:+.2e} "
                  f"unique {int(row['unique_num'])} "
                  f"[{time.perf_counter() - t0:.0f}s]")

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=5000,
        steps_per_call=25,  # matches bench.py so the compile cache is shared
    )
    gap = best["energy"] - mol.fci_energy
    print(f"best {best['energy']:.6f} at iter {best['iter']}; "
          f"gap {gap * 1000:.3f} mHa; "
          f"chemical accuracy: {state['hit']}")


if __name__ == "__main__":
    main()
