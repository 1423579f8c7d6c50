"""N2/STO-3G to chemical accuracy: the BASELINE.md north-star run.

Usage: python examples/n2_convergence.py [iters]
Writes runs/n2/result.csv; prints progress and the final verdict.

The VMC object comes from bench.build_vmc(), so this trains THE program the
benchmark measures (one shared compile): 16384 Gumbel samples cover the full
14400-determinant (N_alpha, N_beta) sector every iteration, making the
reported energy the exact Rayleigh quotient of the ansatz.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_vmc  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    mol, vmc = build_vmc()
    # The bench skips the correlated ladder; fetch the FCI target (cache
    # upgrade computes it once and re-saves).
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    mol = Molecule.create(MolConfig(name="N2", basis="sto-3g"),
                          mols_dir="mols")
    print(f"N2: HF {mol.hf_energy:.6f} CISD {mol.cisd_energy:.6f} "
          f"FCI {mol.fci_energy:.6f} ndet {mol.fci_ndet}", flush=True)

    vmc.run_dir = "runs/n2"
    os.makedirs(vmc.run_dir, exist_ok=True)
    with open(os.path.join(vmc.run_dir, "config.json"), "w") as f:
        f.write(vmc.config.to_json())

    t0 = time.perf_counter()
    state = {"best": 1e9, "hit": None}

    def progress(it, row):
        gap = row["energy"] - mol.fci_energy
        if row["energy"] < state["best"]:
            state["best"] = row["energy"]
            if gap < 1.6e-3 and state["hit"] is None:
                state["hit"] = (it, time.perf_counter() - t0)
                print(f"*** chemical accuracy at iter {it} "
                      f"({state['hit'][1]:.0f}s) ***", flush=True)
        if it % 200 == 0:
            print(f"iter {it:6d} E {row['energy']:+.6f} "
                  f"best-gap {state['best'] - mol.fci_energy:+.2e} "
                  f"unique {int(row['unique_num'])} "
                  f"var {row['energy_var']:.2e} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=5000,
        steps_per_call=25,  # the exact program bench.py measures
    )
    gap = best["energy"] - mol.fci_energy
    print(f"best {best['energy']:.6f} at iter {best['iter']}; "
          f"gap {gap * 1000:.3f} mHa; "
          f"chemical accuracy: {state['hit']}")


if __name__ == "__main__":
    main()
