"""Li2O support-CI closure, leg 3: VMC with the enriched support pinned.

After distillation (examples/li2o_support_ci.py + li2o_sci_polish.py)
the NADE's restriction to the enriched 131k-det support is at
+0.21 mHa, but its sampled full energy reads ~+3 mHa: the fit leaks
amplitude onto out-of-support determinants with an unconstrained
profile. The energy gradient is the natural trimmer (junk amplitude
raises E and gets pushed down) -- but plain VMC would also slowly
forget the tail its top-k window never samples (the original trap).
``couple_support_file`` closes the loop: the top-8192 enriched-CI dets
(restricted E0 = +0.111 mHa on their own) ride in every batch with Born
weights, so the gradient keeps seeing the tail while it trims the leak.

Usage: python examples/li2o_pin_vmc.py [iters] [lr] [src_ckpt]
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

FCI = -88.705450
RUN_DIR = "runs/li2o_pin"


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    src = sys.argv[3] if len(sys.argv) > 3 else "runs/li2o_sci/ckpt_13"

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
    )
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=16384,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            lr=lr,
            lr_schedule=((0, lr), (3000, lr / 3), (5000, lr / 10)),
            grad_clip_norm=0.5,
            grad_weight_temperature=2.0,
            use_theor_freqs=True,
            sr=SRConfig(max_indices_num=50),
            couple_support_file="runs/li2o_sci/target.npz",
            couple_support_k=8192,
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
            full_energy_period=250,
            seed=0,
            iter_num=iters,
        ),
        AnqsConfig(net_type="nade", hidden_widths=(128, 128),
                   aux_hidden_widths=(128, 128)),
        run_dir=RUN_DIR,
    )

    def latest(d):
        cs = sorted(
            (c for c in os.listdir(d) if c.startswith("ckpt_")),
            key=lambda c: int(c.split("_")[1]),
        ) if os.path.isdir(d) else []
        return os.path.join(d, cs[-1]) if cs else None

    resume = latest(RUN_DIR)
    if resume is None:
        params, _, key, _ = vmc.load_checkpoint(src)
        resume = os.path.join(RUN_DIR, "ckpt_0")
        vmc.save_checkpoint(resume, params, vmc.opt.init(params), key, 0)
        print(f"warm start from {src}", flush=True)
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
        iter_num=iters, on_iter=progress, checkpoint_every=250,
        steps_per_call=25, resume_from=resume,
    )
    fulls = [
        h["full_energy"] for h in history
        if np.isfinite(h.get("full_energy", np.nan))
    ]
    best_full = min(fulls) if fulls else float("nan")
    gap = (best_full - FCI) * 1e3
    print(
        f"best proxy {best['energy']:.6f} at {best['iter']}; "
        f"best FULL {best_full:.6f} gap {gap:+.3f} mHa "
        f"({'CHEMICAL ACCURACY' if gap < 1.6 else 'not yet'})"
    )


if __name__ == "__main__":
    main()
