"""Li2O chemical-accuracy closure: resume the tempered campaign with a
longer/finer LR ladder.

Round-3 diagnosis chain (docs/DESIGN_NOTES.md): the Li2O plateau is a
pure amplitude-profile OPTIMIZATION failure (capacity ruled out by
distilling NADE-64 onto the exact FCI vector to +1.00 mHa; signs ruled
out by the error decomposition). Round-4 lever #1 -- tempered gradient
weights (|psi|^(2/T), T=2) -- broke the 94.0% Born plateau (the
cisd_nade_t2 campaign climbs through 95%), but that campaign's LR
schedule (3e-5 from iter 3000) throttles the climb to ~0.05 mHa/1000
iters. This closure run resumes from its best checkpoint with the
schedule the 32k-iter distillation probe proved out: a long 1e-4 leg,
then 3e-5, then a 1e-5 polish.

Usage: python examples/li2o_closure.py [src_run] [iters] [T]
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

FCI = -88.705450  # in-tree direct-CI anchor (runs/li2o_fci_summary.json)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "runs/li2o_cisd_nade_t2"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    temp = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
    )
    hf = mol.hf_energy
    run_dir = "runs/li2o_closure"

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=8192,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            lr=1e-4,
            lr_schedule=((0, 1e-4), (8000, 3e-5), (13000, 1e-5)),
            grad_clip_norm=0.5,
            sr=SRConfig(max_indices_num=50),
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
            full_energy_period=500,
            seed=0,
            iter_num=iters,
            grad_weight_temperature=temp,
        ),
        AnqsConfig(net_type="nade", hidden_widths=(128, 128),
                   aux_hidden_widths=(128, 128)),
        run_dir=run_dir,
    )

    # Resume preference: our own checkpoints, else the source campaign's
    # latest (fresh optimizer state is fine for a pure-Adam refinement).
    def latest(d):
        if not os.path.isdir(d):
            return None
        cs = sorted(
            (c for c in os.listdir(d) if c.startswith("ckpt_")),
            key=lambda c: int(c.split("_")[1]),
        )
        return os.path.join(d, cs[-1]) if cs else None

    resume = latest(run_dir)
    if resume is None:
        src_ckpt = latest(src)
        assert src_ckpt, f"no checkpoint under {src}"
        params, opt_state, key, _ = vmc.load_checkpoint(src_ckpt)
        resume = os.path.join(run_dir, "ckpt_0")
        vmc.save_checkpoint(resume, params, vmc.opt.init(params), key, 0)
        print(f"warm start from {src_ckpt}", flush=True)
    else:
        print(f"resuming from {resume}", flush=True)

    t0 = time.perf_counter()

    def progress(it, row):
        if it % 250 == 0 or np.isfinite(row.get("full_energy", np.nan)):
            gap = (row["energy"] - FCI) * 1e3
            print(
                f"iter {it:6d} E {row['energy']:+.6f} "
                f"gap {gap:+.3f} mHa "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"[{time.perf_counter() - t0:.0f}s]", flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=500,
        steps_per_call=25, resume_from=resume,
    )
    gap = (best["energy"] - FCI) * 1e3
    corr = (best["energy"] - hf) / (FCI - hf)
    print(
        f"best {best['energy']:.6f} at {best['iter']} "
        f"gap {gap:+.3f} mHa ({100 * corr:.2f}% of FCI corr; "
        f"{'CHEMICAL ACCURACY' if gap < 1.6 else 'not yet'})"
    )


if __name__ == "__main__":
    main()
