"""CISD-pretrained ANQS VMC: the peaked-regime escape, for any molecule.

Round-2's 52-qubit record showed the HF-peak trap: cold-started VMC
either freezes at exactly HF (transformer) or plateaus far from
chemical accuracy (MADE 28% corr on C2H4; 66% on Li2O). The CISD vector
is classically cheap, recovers ~85-90% of the correlation energy
variationally, and is an explicit (determinant, coefficient) list -- so
the ansatz is warm-started by supervised distribution matching
(optim/pretrain.py) and VMC descends from CISD quality instead of from
the HF peak. Beating the CISD energy variationally is then the crisp
success criterion even where FCI is uncomputable.

Usage: python examples/cisd_pretrain_vmc.py <molecule> [basis] [iters]
       [sample_num] [net] [qpq] [theor] [grad_temp]
(theor=0 switches the estimator to empirical Gumbel weights -- the
peaked-regime escape hatch: Born weights concentrate all gradient mass
on the dominant determinant and the transformer collapses back onto it)
e.g.   python examples/cisd_pretrain_vmc.py C2H4 6-31g 4000 8192 made 4
       python examples/cisd_pretrain_vmc.py Li2O sto-3g 4000 8192 made 6
Writes runs/<mol>_cisd_<net>/.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.pretrain import (
    amplitude_targets_from_coefs,
    pack_dets,
    pretrain,
)
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "C2H4"
    basis = sys.argv[2] if len(sys.argv) > 2 else "6-31g"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    sample_num = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    net = sys.argv[5] if len(sys.argv) > 5 else "made"
    qpq = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    theor = bool(int(sys.argv[7])) if len(sys.argv) > 7 else True
    # Tail-boosted gradient weights |psi|^(2/T) (estimators stay Born):
    # the round-3 Li2O decomposition pinned the >40q plateaus on the
    # Born gradient's vanishing tail mass (docs/DESIGN_NOTES.md).
    grad_temp = float(sys.argv[8]) if len(sys.argv) > 8 else 1.0
    # LR override (flat, no schedule): the 52q transformer A/B -- 1e-4
    # holds H2O but collapses the C2H4 warm start (73.8% corr -> HF in
    # 50 iters, runs/logs/c2h4_tf_probe4096.log); smaller flat LRs are
    # probed through this knob.
    lr_override = float(sys.argv[9]) if len(sys.argv) > 9 else None
    # Scan-window size: the TPU worker watchdog kills single dispatches
    # running >~60-120 s (CLAUDE.md); slow steps (52q transformer at
    # sample 8192) need short windows.
    steps_per_call = int(sys.argv[10]) if len(sys.argv) > 10 else 25

    mol = Molecule.create(
        MolConfig(name=name, basis=basis), mols_dir="mols", run_fci=False,
    )
    hf = mol.hf_energy
    ref = mol.ccsd_t_energy or mol.cisd_energy
    print(
        f"{name}/{basis}: {mol.qubit_num}q HF {hf:.6f} "
        f"CISD {mol.cisd_energy} CCSD(T) {mol.ccsd_t_energy}",
        flush=True,
    )

    # --- CISD vector (cached: the sparse solve can take minutes).
    cache = f"runs/{name.lower()}_cisd_vector.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        dets, coef, e_cisd = d["dets"], d["coef"], float(d["e_cisd"])
    else:
        t0 = time.perf_counter()
        hf_det = int(np.asarray(mol.hf_det).ravel()[0])
        e_cisd, dets, coef = fci_mod.cisd_ground_state(
            mol.h1, mol.v, hf_det, mol.e_nuc
        )
        os.makedirs("runs", exist_ok=True)
        np.savez(
            cache,
            dets=np.array([int(x) for x in dets], dtype=np.uint64),
            coef=coef, e_cisd=e_cisd,
        )
        print(f"CISD solved in {time.perf_counter() - t0:.0f}s",
              flush=True)
    print(
        f"CISD: {len(dets)} dets, E {e_cisd:.6f} "
        f"({100 * (e_cisd - hf) / (ref - hf):.1f}% of corr)", flush=True,
    )

    probs, phases = amplitude_targets_from_coefs(coef)
    words = pack_dets(dets, mol.qubit_num)

    run_dir = f"runs/{name.lower()}_cisd_{net}" + (
        "" if theor else "_emp"
    ) + ("" if grad_temp == 1.0 else f"_t{grad_temp:g}") + (
        "" if lr_override is None else f"_lr{lr_override:g}"
    )
    base_dir = f"runs/{name.lower()}_cisd_{net}" + ("" if theor else "_emp")
    if net == "nade":
        anqs_cfg = AnqsConfig(net_type="nade", hidden_widths=(128, 128),
                              aux_hidden_widths=(128, 128))
    elif net == "transformer":
        # logit_cap: the uncapped transformer collapses onto the HF peak
        # and freezes (round-2 c2h4 run; reproduced cold on H2O).
        # matmul_precision: the TPU's default bf16 multiply stalls the
        # CISD distillation of peaked targets (CE plateaus at 0.43 vs
        # the 0.188 entropy floor on H2O); pin to true f32.
        anqs_cfg = AnqsConfig(net_type="transformer", d_model=128,
                              n_heads=8, n_layers=3, d_ff=512,
                              logit_cap=4.0, matmul_precision="highest")
    else:
        anqs_cfg = AnqsConfig(hidden_widths=(2048,))
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=qpq,
            # Transformer: lr 3e-4 Adam also destroys the warm start
            # (collapse to HF by iter ~100; 1e-4 climbs -- H2O A/B).
            lr=(lr_override if lr_override is not None
                else (1e-4 if net == "transformer" else 3e-4)),
            lr_schedule=(
                None if lr_override is not None
                else ((0, 1e-4), (3000, 3e-5))
                if net == "transformer"
                else ((0, 3e-4), (1500, 1e-4), (3000, 3e-5))
            ),
            grad_clip_norm=0.5,
            # MinSR destroys the CISD-pretrained transformer within ~50
            # iterations (53% corr -> HF; measured A/B on H2O: plain
            # Adam climbs steadily from the same checkpoint) -- the
            # top-k sample-space preconditioner misbehaves on attention/
            # layernorm parameter scales. MADE/NADE keep SR.
            sr=(None if net == "transformer"
                else SRConfig(max_indices_num=50)),
            # No HF-neighborhood pinning: the CISD-pretrained sample set
            # is densely self-connected (every pair of CISD support dets
            # is within 4 excitations), which is also why the prefilter
            # needs dense-regime capacities here.
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
            # The unbiased full-energy measurement evaluates B x M
            # connected amplitudes through the network; at C2H4 scale
            # (8192 x 20776 = 170M) its intermediates exhaust v5e HBM
            # and the TPU worker crashes DETERMINISTICALLY at the first
            # period boundary (observed twice at iter 500). Gate it on
            # the workload size.
            full_energy_period=(
                500 if sample_num * mol.qubit_ham.n_groups < (1 << 27)
                else None
            ),
            seed=0,
            iter_num=iters,
            use_theor_freqs=theor,
            grad_weight_temperature=grad_temp,
        ),
        anqs_cfg,
        run_dir=run_dir,
    )

    # --- pretraining (minibatched over the CISD support), checkpointed as
    # iter-0 so a crashed/killed VMC phase resumes without redoing the
    # 7k-iteration distillation (TPU worker restarts are a fact of life).
    ckpts = sorted(
        (d for d in os.listdir(run_dir) if d.startswith("ckpt_")),
        key=lambda d: int(d.split("_")[1]),
    ) if os.path.isdir(run_dir) else []
    if ckpts:
        resume = os.path.join(run_dir, ckpts[-1])
        print(f"resuming from {resume} (skipping pretrain)", flush=True)
    elif run_dir != base_dir and os.path.isdir(
        os.path.join(base_dir, "ckpt_0")
    ):
        # LR-probe variant: share the base campaign's pretrained warm
        # start instead of re-distilling.
        params, _, key, _ = vmc.load_checkpoint(
            os.path.join(base_dir, "ckpt_0")
        )
        resume = os.path.join(run_dir, "ckpt_0")
        vmc.save_checkpoint(resume, params, vmc.opt.init(params), key, 0)
        print(f"warm start copied from {base_dir}/ckpt_0", flush=True)
    else:
        params, _, key = vmc.init_state()
        t0 = time.perf_counter()

        def plog(row):
            print(f"  pretrain {row['iter']:5d} loss {row['loss']:.5f} "
                  f"ce {row['cross_entropy']:.5f} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

        pkey = jax.random.PRNGKey(0)
        batch = min(8192, words.shape[0])
        for stage_iters, lr in ((2500, 1e-3), (2500, 3e-4), (2000, 1e-4)):
            params, _ = pretrain(
                vmc.anqs, params, words, probs, phases, pkey,
                iters=stage_iters, lr=lr, batch=batch, on_log=plog,
            )
        resume = os.path.join(run_dir, "ckpt_0")
        vmc.save_checkpoint(resume, params, vmc.opt.init(params), key, 0)

    # --- VMC from the warm start.
    t0 = time.perf_counter()

    def progress(it, row):
        if it % 50 == 0 or np.isfinite(row.get("full_energy", np.nan)):
            corr = (row["energy"] - hf) / (ref - hf)
            print(
                f"iter {it:6d} E {row['energy']:+.6f} "
                f"corr {100 * corr:5.1f}% "
                f"full {row.get('full_energy', float('nan')):+.6f} "
                f"unique {int(row['unique_num'])} "
                f"found {int(row['found_pairs'])} "
                f"[{time.perf_counter() - t0:.0f}s]", flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=iters, on_iter=progress, checkpoint_every=250,
        steps_per_call=steps_per_call, resume_from=resume,
    )
    corr = (best["energy"] - hf) / (ref - hf)
    print(
        f"best {best['energy']:.6f} at {best['iter']} "
        f"({100 * corr:.1f}% of CCSD(T) correlation; "
        f"CISD would be {100 * (e_cisd - hf) / (ref - hf):.1f}%)"
    )


if __name__ == "__main__":
    main()
