"""Li2O NADE pilot: the reference Colab recipe, trajectory comparison.

The reference notebook's Li2O run uses the *default* ansatz config, which is
NADE (one depth-2 width-64 residual tanh MLP per qudit, reference
abstract_anqs.py:70-109 de_mode default + mlp.py:73-99 defaults), Adam 1e-3
flat, Gumbel 1e4 uniques, SR top-50 -- and converges toward FCI in ~500
iterations. Round-2 runs here used MADE(512) and plateaued at 66% of the
CCSD(T) correlation energy. This pilot checks whether the NADE conditional
capacity is the missing lever.

Usage: python tools/li2o_nade_pilot.py [iters] [sample_num] [run_dir]
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    sample_num = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    run_dir = sys.argv[3] if len(sys.argv) > 3 else "runs/li2o_nade_pilot"
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-3

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False
    )
    ref = mol.ccsd_t_energy or mol.cisd_energy or mol.hf_energy
    print(
        f"Li2O: {mol.qubit_num} qubits; HF {mol.hf_energy:.6f} "
        f"CISD {mol.cisd_energy} CCSD(T) {mol.ccsd_t_energy}",
        flush=True,
    )

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            lr=lr,
            grad_clip_norm=1.0,
            sr=SRConfig(max_indices_num=50),
            full_energy_period=100,
            seed=0,
        ),
        AnqsConfig(
            net_type="nade",
            hidden_widths=(64, 64),
            aux_hidden_widths=(64, 64),
        ),
        run_dir=run_dir,
    )

    t0 = time.perf_counter()

    def progress(it, row):
        if it % 25 == 0 or row.get("full_energy", float("nan")) == row.get(
            "full_energy"
        ):
            corr = (row["energy"] - mol.hf_energy) / (ref - mol.hf_energy)
            print(
                f"iter {it:5d} E {row['energy']:+.6f} "
                f"corr {100 * corr:5.1f}% "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"unique {int(row['unique_num'])} "
                f"found {int(row['found_pairs'])} "
                f"[{time.perf_counter() - t0:.0f}s]",
                flush=True,
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

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=1000,
        steps_per_call=25, resume_from=resume,
    )
    corr = (best["energy"] - mol.hf_energy) / (ref - mol.hf_energy)
    print(
        f"best {best['energy']:.6f} at iter {best['iter']} "
        f"({100 * corr:.1f}% of CCSD(T) correlation)"
    )


if __name__ == "__main__":
    main()
