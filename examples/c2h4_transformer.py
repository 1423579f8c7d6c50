"""C2H4/6-31G (52 qubits): transformer ANQS in the peaked-wavefunction regime.

Config 5 of the BASELINE.md ladder (the reference's "peaked molecular
wave functions" workload on a ~60-qubit-class active space): a causal
transformer over 13 qudit tokens, Gumbel top-k unique sampling, grouped
matrix elements (no dense (T, M) operand at T=104278, M=20776) and
fingerprint-prefilter membership.

Baselines (this repo's standalone chem stack):
  HF -78.003574  MP2 -78.186426  CISD -78.197997  CCSD -78.213678
  CCSD(T) -78.219007

Usage: python examples/c2h4_transformer.py [iters] [sample_num] [net]
``net``: 'transformer' (default) or 'made'. Writes runs/c2h4_<net>/.

Collapse guard: at 52 qubits the Born-weighted gradient dies if the
log-amplitude contrast runs away (once freq_x = |psi_x|^2/Z underflows
f32, grad_norm hits exact zero and training freezes -- observed with the
untuned transformer at lr 1e-3 + SR: contrast -126 nats by iter 100).
The transformer config therefore uses the logit soft-cap
(AnqsConfig.logit_cap) plus a gentle lr; the MADE config uses the proven
Li2O-style schedule.
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    sample_num = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    net = sys.argv[3] if len(sys.argv) > 3 else "transformer"

    mol = Molecule.create(
        MolConfig(name="C2H4", basis="6-31g"), mols_dir="mols",
        run_fci=False,
    )
    ref = mol.ccsd_t_energy or mol.ccsd_energy or mol.hf_energy
    print(
        f"C2H4/6-31G: {mol.qubit_num} qubits, M={mol.qubit_ham.n_groups}; "
        f"HF {mol.hf_energy:.6f} CISD {mol.cisd_energy} "
        f"CCSD(T) {mol.ccsd_t_energy}",
        flush=True,
    )

    if net == "made":
        anqs_config = AnqsConfig(hidden_widths=(512,))
        lr_schedule = ((0, 1e-3), (1500, 3e-4))
        clip = 0.5
    else:
        anqs_config = AnqsConfig(
            net_type="transformer", d_model=128, n_layers=3, n_heads=4,
            d_ff=512, logit_cap=4.0,
        )
        # Warmup: the transformer's un-warmed descent overshoots into
        # ~-86-nat contrast before the neighborhood pull-up can organize
        # the excitation amplitudes; MADE escapes because it lingers in
        # the moderate-contrast zone. Slow the approach to the peak.
        lr_schedule = ((0, 3e-5), (400, 1e-4), (1500, 3e-4))
        clip = 0.25
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=4,
            lr=lr_schedule[0][1],
            lr_schedule=lr_schedule,
            grad_clip_norm=clip,
            sr=SRConfig(max_indices_num=50),
            # At 52 qubits a 4096-state sample has no H-connected pairs
            # (found_pairs == B, E frozen at HF); pin the top-2048
            # |<HF^A|H|HF>| neighbors so the excitation amplitudes get
            # their pull-up gradient.
            couple_ref_dets=2048,
            seed=0,
        ),
        anqs_config,
        run_dir=f"runs/c2h4_{net}",
    )

    t0 = time.perf_counter()

    def progress(it, row):
        if it % 50 == 0:
            print(
                f"iter {it:5d} E {row['energy']:+.6f} "
                f"corr {(row['energy'] - mol.hf_energy) * 1e3:+.1f} mHa "
                f"gap-to-CCSD(T) {(row['energy'] - ref) * 1e3:+.1f} mHa "
                f"found {int(row['found_pairs'])} "
                f"ipr {row['ipr']:.3f} "
                f"[{time.perf_counter() - t0:.0f}s]",
                flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=1000,
        steps_per_call=25,
    )
    print(
        f"best {best['energy']:.6f} at iter {best['iter']} "
        f"(corr {(best['energy'] - mol.hf_energy) * 1e3:+.1f} mHa of "
        f"CCSD(T) {(ref - mol.hf_energy) * 1e3:+.1f} mHa)"
    )


if __name__ == "__main__":
    main()
