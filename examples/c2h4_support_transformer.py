"""C2H4 transformer + support-restricted treatment (VERDICT r4 item 6).

The causal-transformer ANQS is first-class peaked-regime machinery in
the reference (legacy transformer_made.py:9-48) but here it has only
ever run plain VMC (75.3% corr at 8192 samples,
runs/c2h4_cisd_transformer_emp_lr0.0001). This gives it the exact
support-restricted recipe that took the MADE from 62% to 85.6%:
warm-start from the 75.3% checkpoint, refit/rq/rql waves on the 262k
SCI support with sampled-full-energy acceptance.

Usage: python examples/c2h4_support_transformer.py [cmd] [arg]
  cmd = measure -> sampled full energy of the warm start
  cmd = refit   -> magnitude-repair stages (support_vmc objective='refit')
  cmd = rq      -> Adam rq wave
  cmd = rql     -> L-BFGS hinge wave
  cmd = confirm -> 5-shot confirmation of the best stage
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments import support_ci
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig

RUN_DIR = "runs/c2h4_sci_tr"
TARGET = "runs/c2h4_sci/target.npz"
H_PATH = "runs/c2h4_sci/h_support.npz"
WARM = "runs/c2h4_cisd_transformer_emp_lr0.0001/ckpt_3000"


def make_vmc(mol):
    return VMC(
        mol,
        VMCConfig(
            sample_num=8192, sampling_mode="gumbel", qubit_per_qudit=4,
            seed=0,
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
        ),
        # EXACTLY the 75.3% run's ansatz (its config.json + the
        # cisd_pretrain_vmc.py transformer branch): capped logits,
        # true-f32 matmuls.
        AnqsConfig(net_type="transformer", d_model=128, n_heads=8,
                   n_layers=3, d_ff=512, logit_cap=4.0,
                   matmul_precision="highest"),
        run_dir=RUN_DIR,
    )


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "measure"
    arg = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    mol = Molecule.create(
        MolConfig(name="C2H4", basis="6-31g"), mols_dir="mols",
        run_fci=False,
    )
    hf, ref, cisd = mol.hf_energy, mol.ccsd_t_energy, mol.cisd_energy
    print(f"C2H4/6-31g: {mol.qubit_num}q HF {hf:.6f} CISD {cisd:.6f} "
          f"CCSD(T) {ref:.6f}", flush=True)

    def corr(e):
        return 100.0 * (e - hf) / (ref - hf)

    d = np.load(TARGET)
    td = [int(x) for x in d["dets"]]
    tc = np.asarray(d["coef"], np.float64)
    print(f"target: |S|={len(td)} E0={float(d['e0']):.6f} "
          f"({corr(float(d['e0'])):.2f}%)", flush=True)
    vmc = make_vmc(mol)
    target = support_ci.make_target(td, tc, mol.qubit_num)

    results_path = os.path.join(RUN_DIR, "summary.json")
    results = (json.load(open(results_path))
               if os.path.exists(results_path)
               else {"warm": WARM, "stages": []})

    def best_ckpt():
        rows = sorted(results["stages"], key=lambda s: s["full_e"])
        for r in rows:
            ck = r.get("ckpt")
            if ck and os.path.isdir(ck):
                return ck
        return None

    src = best_ckpt() or WARM
    params, _, key, stage = vmc.load_checkpoint(src)
    print(f"params from {src}", flush=True)

    def measure(prm, tag):
        nonlocal key
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        # row_chunk 128 (vs the MADE driver's 1024): the transformer
        # forward over 1024x536 connected rows per dispatch crashed the
        # TPU worker twice (q14_tr_measure rc=1, 01:39/01:47 -- the
        # known big-dispatch HBM/watchdog kill mode); 8x smaller
        # dispatches keep each launch inside the envelope.
        e, var = support_ci.sampled_full_energy(
            vmc, prm, sub, sample_num=8192,
            row_chunk=int(os.environ.get("ANQS_TR_ROW_CHUNK", "128")),
        )
        print(f"  [{tag}] sampled full energy {e:+.6f} "
              f"({corr(e):.2f}% corr) var {var:.2e} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        return e

    t0 = time.perf_counter()

    def commit_row(row, ck=None):
        if ck:
            row["ckpt"] = ck
        results["stages"].append(row)
        best = min(s["full_e"] for s in results["stages"])
        results["best_full_e"] = best
        results["best_corr_pct"] = corr(best)
        bc = best_ckpt()
        if bc:
            results["best_ckpt"] = bc
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)

    if cmd == "measure":
        measure(params, "warm start")
        return

    if cmd == "confirm":
        es = np.array([measure(params, f"confirm {i}") for i in range(5)])
        np.save(os.path.join(RUN_DIR, "confirm_energies.npy"), es)
        print(f"confirm: mean {es.mean():+.6f} +/- {es.std():.6f} "
              f"({corr(es.mean()):.2f}% corr)", flush=True)
        return

    import scipy.sparse

    h = scipy.sparse.load_npz(H_PATH)
    print(f"restricted H loaded: nnz={h.nnz}", flush=True)
    base = {"refit": 60, "rq": 20, "rql": 40}[cmd]
    sbase = base + sum(
        1 for s in results["stages"]
        if base <= s["stage"] < base + 20
    )

    def on_log(row):
        extra = (f" loss {row['refit_loss']:.6f}"
                 if "refit_loss" in row else "")
        it_k = row.get("iter", row.get("eval", 0))
        print(f"  {cmd} stage {row.get('stage', 0)} it {it_k:4d} "
              f"rq {row['rq']:+.6f} ({corr(row['rq']):.2f}%) "
              f"mass {row['mass']:.6f} best {row['best_rq']:+.6f}"
              f"{extra} [{time.perf_counter() - t0:.0f}s]", flush=True)

    def on_stage(row, prm):
        si = sbase + row["stage"]
        ck = None
        if row.get("accepted", True):
            ck = os.path.join(RUN_DIR, f"ckpt_{si}")
            vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
        commit_row({
            "stage": si, "optimizer": cmd,
            "full_e": row["energy"], "corr_pct": corr(row["energy"]),
            "best_rq": row["best_rq"],
            "rq_corr_pct": corr(row["best_rq"]),
            "accepted": row.get("accepted"),
        }, ck)
        print(f"  {cmd} stage {si} accepted={row.get('accepted')} "
              f"full_e {row['energy']:+.6f}", flush=True)

    if cmd == "refit":
        # Mixed rq_refit with clamped residuals (q11_refit attempt-1
        # live lesson on the MADE: pure refit at lr 3e-4 with unclamped
        # tail residuals collapsed rq -78.19 -> -77.2 in 75 steps and
        # leaked mass to 0.92; the rq guard + +-3 clamp is the verified
        # repair objective, commit 623da95).
        params, info = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=(1e-4, 3e-5), steps_per_stage=arg or 300,
            chunk=8192, mass_lam=30.0, grad_clip=1000.0,
            log_every=25, on_log=on_log, on_stage=on_stage,
            objective="rq_refit", refit_clip=3.0, refit_beta=1.0,
            target_coef=tc,
            accept_fn=lambda prm: measure(prm, "refit acceptance"),
        )
    elif cmd == "rq":
        params, info = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=(1e-3, 5e-4, 3e-4), steps_per_stage=arg or 600,
            chunk=8192, mass_lam=3.0, grad_clip=1000.0,
            log_every=50, on_log=on_log, on_stage=on_stage,
            accept_fn=lambda prm: measure(prm, "rq acceptance"),
        )
    elif cmd == "rql":
        params, info = support_ci.support_vmc_lbfgs(
            vmc.anqs, params, target, h, mol.e_nuc,
            maxiter=arg or 1200, segment=200, chunk=8192,
            mass_lam=30.0, mass_width=1e-5, mass_slack=3e-5,
            log_every=25, on_log=on_log, on_stage=on_stage,
            accept_fn=lambda prm: measure(prm, "rql acceptance"),
        )

    best = results.get("best_full_e")
    if best is not None:
        print(f"BEST sampled full energy {best:.6f} = "
              f"{corr(best):.2f}% of CCSD(T) correlation")


if __name__ == "__main__":
    main()
