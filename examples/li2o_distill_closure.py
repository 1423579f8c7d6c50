"""Li2O closure attempt via distillation-interleaved VMC -- a MEASURED
NEGATIVE (kept as the record; the working closure is
examples/li2o_support_ci.py).

Hypothesis: the +6.17 mHa tempered-weight plateau
(examples/li2o_closure.py) is amplitude-profile optimization, so
interleaving supervised imaginary-time cycles (VMCConfig.distill_*:
fit |phi> = (1 - tau(H_SS - E))|psi> built from the sample's own local
energies) should descend where the Born/tempered gradient cannot.

Result (pilot, 600 iters / 60 cycles, tau=0.1, CE loss, warm from
runs/li2o_closure/ckpt_16000): energy FLAT at +6.2 mHa. Two reasons,
both now understood (docs/DESIGN_NOTES.md "diagnosis CORRECTED"):
(1) the per-cycle imaginary-time gain is tau*var(E_loc) = 0.1*3.3e-5
Ha^2 = 0.003 mHa -- the plateaued state is a near-eigenstate of its
support-projected H; (2) decisively, the exact ground state of H
restricted to the state's own sampled support is +6.159 mHa -- the
projector cannot inject determinants the sampler never proposes. The
plateau is SUPPORT QUALITY, not optimization; no within-support method
can close it.

Reference counterpart: none (TPU-rebuild capability). The reference's
Li2O Colab converges in ~500 iters with plain SR
(/root/reference/nqs/colab_toy_model.ipynb cells 15-28); matching its
physics on this system is VERDICT round-2 item 3.

Usage: python examples/li2o_distill_closure.py [src_run] [iters] [tau]
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
    src = sys.argv[1] if len(sys.argv) > 1 else "runs/li2o_closure"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1

    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
    )
    hf = mol.hf_energy
    run_dir = "runs/li2o_distill"

    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=8192,
            sampling_mode="gumbel",
            qubit_per_qudit=6,
            lr=3e-5,
            grad_clip_norm=0.5,
            grad_weight_temperature=2.0,
            sr=SRConfig(max_indices_num=50),
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
            full_energy_period=250,
            seed=0,
            iter_num=iters,
            distill_period=10,
            distill_steps=100,
            distill_tau=tau,
            distill_lr=1e-4,
            distill_loss="ce",
        ),
        AnqsConfig(net_type="nade", hidden_widths=(128, 128),
                   aux_hidden_widths=(128, 128)),
        run_dir=run_dir,
    )

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
        if it % 100 == 0 or np.isfinite(row.get("full_energy", np.nan)):
            gap = (row["energy"] - FCI) * 1e3
            dl = row.get("distill_loss_last", float("nan"))
            print(
                f"iter {it:6d} E {row['energy']:+.6f} "
                f"gap {gap:+.3f} mHa "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"dloss {dl:.5f} "
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
