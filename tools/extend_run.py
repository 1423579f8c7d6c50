"""Resume a checkpointed run and extend it with a decayed learning rate.

Usage: python tools/extend_run.py <run_dir> <molecule> <extra_iters>
       [lr] [hidden_width]

Rebuilds the VMC stack from the run's config.json, resumes from the
latest checkpoint, and continues training (periodic unbiased full-energy
measurements on; new checkpoints written into the same run dir).
"""

import json
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
    run_dir = sys.argv[1]
    mol_name = sys.argv[2]
    extra = int(sys.argv[3])
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 5e-4
    width = int(sys.argv[5]) if len(sys.argv) > 5 else 512

    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    ckpts = sorted(
        (d for d in os.listdir(run_dir) if d.startswith("ckpt_")),
        key=lambda d: int(d.split("_")[1]),
    )
    last = os.path.join(run_dir, ckpts[-1])
    start = int(ckpts[-1].split("_")[1])

    mol = Molecule.create(
        MolConfig(name=mol_name), mols_dir="mols", run_cisd=False
    )
    ref = mol.fci_energy or mol.ccsd_t_energy or mol.cisd_energy
    sr = cfg.get("sr") or {}
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=cfg["sample_num"],
            sampling_mode=cfg["sampling_mode"],
            qubit_per_qudit=cfg["qubit_per_qudit"],
            lr=lr,
            grad_clip_norm=cfg.get("grad_clip_norm"),
            sr=SRConfig(**sr) if sr else None,
            full_energy_period=250,
            seed=cfg.get("seed", 0),
            iter_num=start + extra,
        ),
        AnqsConfig(hidden_widths=(width,)),
        run_dir=run_dir,
    )

    t0 = time.perf_counter()

    def progress(it, row):
        import numpy as np

        if it % 100 == 0 or np.isfinite(row.get("full_energy", np.nan)):
            print(
                f"iter {it:6d} E {row['energy']:+.6f} "
                f"gap {row['energy'] - ref:+.2e} "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"[{time.perf_counter() - t0:.0f}s]",
                flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=start + extra,
        on_iter=progress,
        checkpoint_every=1000,
        resume_from=last,
        steps_per_call=25,
    )
    print(
        f"best {best['energy']:.6f} at iter {best['iter']} "
        f"(gap {1e3 * (best['energy'] - ref):+.3f} mHa)"
    )


if __name__ == "__main__":
    main()
