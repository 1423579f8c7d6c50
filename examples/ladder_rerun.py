"""Re-run a committed ladder artifact config with checkpoints + inline
unbiased full energy (CPU-friendly: H2O/BeH2 train in ~an hour of CPU).

The round-2/3 ladder campaigns proved H2O/BeH2 within ~1 mHa of FCI but
their checkpoints were never committed, so the f64 full-energy
revalidation cannot be reproduced from the repo alone. This rerun uses
the committed runs/beh2 recipe (gumbel 2048, qpq=6, Adam 5e-4, SR
top-50, full_energy_period=250) and records the unbiased full-energy
estimator inline on the 25-step scan path (round-2 VERDICT item #5),
checkpointing every 1000 iterations.

Usage: python examples/ladder_rerun.py <molecule> [iters] [run_dir]
       [sample_num] [lr]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    run_dir = (
        sys.argv[3] if len(sys.argv) > 3 else f"runs/{name.lower()}_r3"
    )
    sample_num = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    lr = float(sys.argv[5]) if len(sys.argv) > 5 else 5e-4

    mol = Molecule.create(MolConfig(name=name), mols_dir="mols")
    fci = mol.fci_energy
    print(
        f"{name}: {mol.qubit_num}q HF {mol.hf_energy:.6f} "
        f"FCI {fci}", flush=True,
    )

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            lr=lr,
            sr=SRConfig(max_indices_num=50),
            full_energy_period=250,
            seed=0,
            iter_num=iters,
        ),
        AnqsConfig(hidden_widths=(512,)),
        run_dir=run_dir,
    )

    resume = None
    if os.path.isdir(run_dir):
        ckpts = sorted(
            (d for d in os.listdir(run_dir) if d.startswith("ckpt_")),
            key=lambda d: int(d.split("_")[1]),
        )
        if ckpts:
            resume = os.path.join(run_dir, ckpts[-1])
            print(f"resuming from {resume}", flush=True)

    t0 = time.perf_counter()

    def progress(it, row):
        if it % 250 == 0 or np.isfinite(row.get("full_energy", np.nan)):
            gap = (row["energy"] - fci) * 1e3 if fci else float("nan")
            print(
                f"iter {it:6d} E {row['energy']:+.6f} "
                f"gap {gap:+.3f} mHa "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"[{time.perf_counter() - t0:.0f}s]", flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=1000,
        steps_per_call=25, resume_from=resume,
    )
    print(f"best {best['energy']:.6f} at {best['iter']}")
    if fci:
        print(f"gap to FCI {(best['energy'] - fci) * 1e3:+.3f} mHa")


if __name__ == "__main__":
    main()
