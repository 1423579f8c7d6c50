"""C2H4/6-31G (52 qubits) support-CI closure: the peaked-regime flagship.

Applies the Li2O-proven enrich -> distill -> polish pipeline
(experiments/support_ci.py; runs/li2o_sci closed at +0.280 mHa) to the
52-qubit system the round-2 VERDICT named as the second paper's regime.
Plain VMC history here: transformer frozen at exactly HF (round 2),
CISD-pretrained MADE-2048 at 74.4% of CCSD(T) correlation after 4000
iters (runs/c2h4_cisd_made). The remaining energy lives in
determinants the sampler never proposes, so the closure is host-side
support enrichment:

1. HOST: seed = CISD support (29593 dets, 90.2% corr) union the trained
   model's own Gumbel samples; heat-bath-screened selected-CI rounds
   (chem/selected_ci.py: HeatBathTable prefix walks -- unscreened
   expansion is intractable at ~30k doubles/det) with restricted
   diagonalization via the C++ Slater-Condon builder. First round
   measured at -78.211312 = 96.4% corr (155k dets).
2. Truncate to the smallest power-of-two support within 0.3 mHa,
   re-diagonalize restricted (compact distillation target).
3. TPU distill: staged-LR minibatch CE onto the enriched vector from
   the trained MADE-2048 warm start.
4. TPU polish: full-support deterministic fit with the LINEAR
   on-support-mass penalty (support_ci.polish).
5. Measure: sampled full energy, ROW-CHUNKED (8192 x 20776 connected
   amplitudes in one dispatch exhausts v5e HBM -- the round-2 crash).

The final number is the network's own unbiased local-energy estimator,
not a CI energy. No FCI oracle exists at this scale; success criteria
are (a) variationally below CISD, (b) % of CCSD(T) correlation.

Reference counterpart: none (the reference's peaked-wavefunction paper
trains plain VMC); this is the TPU rebuild's answer to top-k support
truncation at 52 qubits. VERDICT round-2 item 2.

Usage: python examples/c2h4_support_ci.py [cmd]
  cmd = target  -> host enrichment only (CPU; writes target.npz)
  cmd = distill -> staged CE distillation (TPU)
  cmd = polish  -> mass-penalized polish (TPU)
  cmd = rq      -> support-restricted VMC: minimize the EXACT restricted
                   Rayleigh quotient from the best recorded stage
                   (needs runs/c2h4_sci/h_support.npz from
                   tools/build_c2h4_support_h.py). Round-4 leg: the
                   round-3 post-mortem showed CE distillation saturates
                   its entropy floor at 62% corr and the regression
                   polish is energy-misaligned (-47% corr); this leg
                   optimizes the energy itself with per-stage sampled
                   full-energy acceptance rollback.
  cmd = confirm -> 5 repeated sampled measurements of the best stage
  cmd = all     -> everything, resumable (default)
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
from anqs_quantum_chemistry_tpu.chem import selected_ci as sci
from anqs_quantum_chemistry_tpu.experiments import support_ci
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.pretrain import pretrain

RUN_DIR = "runs/c2h4_sci"
TARGET = os.path.join(RUN_DIR, "target.npz")
WARM = "runs/c2h4_cisd_made/ckpt_4000"
CISD_CACHE = "runs/c2h4_cisd_vector.npz"
# Heat-bath selected-CI rounds: (eps, n_parents, max_total_size).
ROUNDS = ((3e-4, 4000, 400_000), (1.5e-4, 20000, 700_000))
ROUND_TOL = 3e-4  # Ha: stop when a round gains less than this


def prep_mol():
    return Molecule.create(
        MolConfig(name="C2H4", basis="6-31g"), mols_dir="mols",
        run_fci=False,
    )


def build_target(mol, seed_dets):
    """Host phase: heat-bath selected-CI rounds + truncation."""
    hf, ref = mol.hf_energy, mol.ccsd_t_energy

    def corr(e):
        return 100.0 * (e - hf) / (ref - hf)

    t0 = time.perf_counter()
    table = sci.HeatBathTable(mol.h1, mol.v)
    print(f"heat-bath table [{time.perf_counter() - t0:.0f}s]", flush=True)

    dets = sorted(set(int(d) for d in seed_dets))
    t0 = time.perf_counter()
    energy, coef = sci.restricted_ground_state(
        dets, mol.h1, mol.v, mol.e_nuc
    )
    print(f"seed: |S|={len(dets)} E0={energy:.6f} ({corr(energy):.1f}% "
          f"corr) [{time.perf_counter() - t0:.0f}s]", flush=True)

    for rnd, (eps, n_par, cap) in enumerate(ROUNDS):
        t0 = time.perf_counter()
        bigger = sci.expand_support_heatbath(
            dets, coef, table, eps, n_par,
            max_new=max(0, cap - len(dets)),
        )
        if len(bigger) == len(dets):
            print(f"round {rnd}: no new dets", flush=True)
            break
        t1 = time.perf_counter()
        e_new, c_new = sci.restricted_ground_state(
            bigger, mol.h1, mol.v, mol.e_nuc
        )
        print(
            f"round {rnd} (eps={eps:g} parents={n_par}): |S|={len(bigger)} "
            f"E0={e_new:.6f} ({corr(e_new):.1f}% corr) gain "
            f"{(energy - e_new) * 1e3:.3f} mHa "
            f"[expand {t1 - t0:.0f}s diag {time.perf_counter() - t1:.0f}s]",
            flush=True,
        )
        gained = energy - e_new
        dets, coef, energy = bigger, c_new, e_new
        if gained < ROUND_TOL:
            break
    e_full, n_full = energy, len(dets)

    # Truncate to the smallest power-of-two support within 0.3 mHa.
    for k in (1 << 17, 1 << 18, 1 << 19):
        if k >= len(dets):
            td, tc, e_k = dets, np.asarray(coef, np.float64), e_full
            break
        td, tc = sci.truncate_by_weight(dets, coef, k)
        t0 = time.perf_counter()
        e_k, tc = sci.restricted_ground_state(td, mol.h1, mol.v, mol.e_nuc)
        print(f"top-{k}: E0={e_k:.6f} ({corr(e_k):.1f}% corr) "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        if e_k - e_full < 3e-4:
            break
    os.makedirs(RUN_DIR, exist_ok=True)
    np.savez_compressed(
        TARGET, dets=np.array(td, np.uint64), coef=tc,
        e0=e_k, e0_full=e_full, n_full=n_full,
    )
    print(f"target saved: |S|={len(td)} E0={e_k:.6f} "
          f"({corr(e_k):.1f}% corr; full expansion {n_full} dets at "
          f"{corr(e_full):.1f}%)", flush=True)
    return td, tc, e_k


def make_vmc(mol, precision=None):
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
        AnqsConfig(hidden_widths=(2048,), matmul_precision=precision),
        run_dir=RUN_DIR,
    )


def latest_ckpt(d):
    cs = sorted(
        (c for c in os.listdir(d) if c.startswith("ckpt_")),
        key=lambda c: int(c.split("_")[1]),
    ) if os.path.isdir(d) else []
    return os.path.join(d, cs[-1]) if cs else None


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    mol = prep_mol()
    hf, ref, cisd = mol.hf_energy, mol.ccsd_t_energy, mol.cisd_energy
    print(f"C2H4/6-31g: {mol.qubit_num}q HF {hf:.6f} CISD {cisd:.6f} "
          f"CCSD(T) {ref:.6f}", flush=True)

    def corr(e):
        return 100.0 * (e - hf) / (ref - hf)

    if not os.path.exists(TARGET):
        d = np.load(CISD_CACHE)
        seed = [int(x) for x in d["dets"]]
        print(f"seed = CISD support ({len(seed)} dets)", flush=True)
        td, tc, e_k = build_target(mol, seed)
    else:
        d = np.load(TARGET)
        td = [int(x) for x in d["dets"]]
        tc = np.asarray(d["coef"], np.float64)
        e_k = float(d["e0"])
        print(f"target loaded: |S|={len(td)} E0={e_k:.6f} "
              f"({corr(e_k):.1f}% corr)", flush=True)
    if cmd == "target":
        return

    # The rq leg (and confirms of its stages) runs at matmul precision
    # HIGHEST: bf16 matmul noise measurably degrades supervised fits of
    # peaked targets (H2O transformer CE 0.188 vs 0.428; VERDICT r3
    # suspect (a)), and the network+precision pair defines the state.
    vmc = make_vmc(mol, precision="highest"
                   if cmd in ("rq", "rql", "refit", "repair", "confirm")
                   else None)
    target = support_ci.make_target(td, tc, mol.qubit_num)

    results_path = os.path.join(RUN_DIR, "summary.json")
    results = (json.load(open(results_path))
               if os.path.exists(results_path)
               else {"target_e0": e_k, "target_size": len(td),
                     "target_corr_pct": corr(e_k), "stages": []})

    def stage_ckpt(si):
        return os.path.join(
            RUN_DIR, f"ckpt_{si + 1 if si < 10 else si}"
        )

    def best_measured_ckpt():
        """Best MEASURED stage whose checkpoint directory actually
        exists (rejected stages save no ckpt; non-force-added ckpts are
        wiped between rounds -- ADVICE r4: never point a resume at a
        checkpoint that may be gone)."""
        rows = sorted(results["stages"], key=lambda s: s["full_e"])
        for row in rows:
            ck = row.get("ckpt") or stage_ckpt(row["stage"])
            if os.path.isdir(ck):
                return row, ck
        raise FileNotFoundError(
            "no recorded stage has an existing checkpoint dir"
        )

    if cmd in ("rq", "rql", "refit", "repair") and results.get("stages"):
        # Resume from the best MEASURED stage, never from "latest"
        # (round-3 lesson: the latest checkpoint was the wrecked
        # polish state at -47% corr).
        best_row, src = best_measured_ckpt()
        params, _, key, stage = vmc.load_checkpoint(src)
    else:
        own = latest_ckpt(RUN_DIR)
        src = own or WARM
        params, _, key, stage = vmc.load_checkpoint(src)
        if not own:
            stage = 0
    print(f"params from {src} (stage {stage})", flush=True)

    def measure(prm, tag):
        nonlocal key
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        e, var = support_ci.sampled_full_energy(
            vmc, prm, sub, sample_num=8192, row_chunk=1024,
        )
        print(f"  [{tag}] sampled full energy {e:+.6f} "
              f"({corr(e):.2f}% corr, {(e - cisd) * 1e3:+.3f} mHa vs "
              f"CISD) var {var:.2e} [{time.perf_counter() - t0:.0f}s]",
              flush=True)
        return e

    t0 = time.perf_counter()

    def plog(row):
        print(f"  distill {row['iter']:5d} loss {row['loss']:.6f} "
              f"ce {row['cross_entropy']:.6f} best {row['best_loss']:.6f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    def commit_row(row, ck=None):
        """Append a stage row and refresh the summary's best fields.
        `best_ckpt` points at the best stage whose checkpoint EXISTS so
        external consumers (queue commit_artifacts, round resumes) never
        re-derive the stage->ckpt naming (ADVICE r4)."""
        if ck:
            row["ckpt"] = ck
        results["stages"].append(row)
        best = min(s["full_e"] for s in results["stages"])
        results["best_full_e"] = best
        results["best_corr_pct"] = corr(best)
        results["vs_cisd_mha"] = (best - cisd) * 1e3
        for r in sorted(results["stages"], key=lambda s: s["full_e"]):
            c = r.get("ckpt") or stage_ckpt(r["stage"])
            if os.path.isdir(c):
                results["best_ckpt"] = c
                break
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)

    def record(si, lr, e, ck):
        commit_row(
            {"stage": si, "lr": lr, "full_e": e, "corr_pct": corr(e)},
            ck,
        )

    if cmd in ("all", "distill"):
        stages = ((6000, 3e-4), (6000, 1e-4), (6000, 3e-5), (6000, 1e-5))
        if stage == 0:
            measure(params, "warm start")
        for si, (iters, lr) in enumerate(stages):
            if si < stage:
                continue
            params, _ = pretrain(
                vmc.anqs, params, target["words"],
                np.asarray(target["p"]), np.asarray(target["ph"]),
                jax.random.PRNGKey(100 + si), iters=iters, lr=lr,
                batch=8192, log_every=1000, on_log=plog,
            )
            e = measure(params, f"distill stage {si} lr={lr:g}")
            ck = os.path.join(RUN_DIR, f"ckpt_{si + 1}")
            vmc.save_checkpoint(ck, params, vmc.opt.init(params), key,
                                si + 1)
            record(si, lr, e, ck)

    if cmd in ("all", "polish"):
        def on_stage(row, prm):
            si = 10 + row["stage"]
            e = measure(prm, f"polish stage {row['stage']} "
                             f"lr={row['lr']:g} mass={row['mass']:.6f}")
            ck = os.path.join(RUN_DIR, f"ckpt_{si}")
            vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
            record(si, row["lr"], e, ck)

        params, _ = support_ci.polish(
            vmc.anqs, params, target, temp=4.0, lam=30.0, kind="lin",
            lrs=(1e-4, 3e-5, 1e-5, 3e-6), steps=2000, window=200,
            chunk=8192, on_stage=on_stage,
        )

    if cmd == "rq":
        import scipy.sparse

        h_path = os.path.join(RUN_DIR, "h_support.npz")
        assert os.path.exists(h_path), (
            "run tools/build_c2h4_support_h.py first (host, CPU-only)"
        )
        h = scipy.sparse.load_npz(h_path)
        print(f"restricted H loaded: nnz={h.nnz}", flush=True)

        def on_log(row):
            fid = (f" fid {row['fid']:.6f}" if "fid" in row else "")
            print(f"  rq stage {row['stage']} iter {row['iter']:4d} "
                  f"rq {row['rq']:+.6f} ({corr(row['rq']):.2f}% corr) "
                  f"mass {row['mass']:.6f} best {row['best_rq']:+.6f}"
                  f"{fid} [{time.perf_counter() - t0:.0f}s]", flush=True)

        # Relaunches resume from the best stage and continue numbering
        # after any rq stages already recorded (so a second rq wave never
        # collides with / overwrites the first wave's stage rows).
        rq_base = 20 + sum(
            1 for s in results.get("stages", []) if s["stage"] >= 20
        )

        def on_stage(row, prm):
            si = rq_base + row["stage"]
            ck = None
            if row.get("accepted", True):
                ck = os.path.join(RUN_DIR, f"ckpt_{si}")
                vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
            commit_row({
                "stage": si, "lr": row["lr"], "full_e": row["energy"],
                "corr_pct": corr(row["energy"]),
                "best_rq": row["best_rq"], "rq_corr_pct": corr(row["best_rq"]),
                "accepted": row.get("accepted"), "precision": "highest",
            }, ck)

        # LR ladder: wave 1 (lrs=(3e-4,...), stage 20) was smooth and
        # monotonic but slow -- 62.3 -> 82.5% corr in 900 iters with
        # ~1.2 mHa/100-iter tail rate, far short of the ~30 mHa left.
        # The LiH-proven recipe starts at 1e-3 (test_support_ci_pipeline:
        # 0.141 mHa); per-iter best_rq snapshots + stage acceptance
        # rollback bound the downside of the hotter start.
        # `rq overlap` switches the host gradient to the log-fidelity
        # against the known SCI vector (support_vmc objective='overlap').
        # Measured on LiH it is SLOWER than the rq gradient on the tail
        # (+0.90 vs +0.62 mHa at 600 iters -- fidelity is dominated by
        # the large amplitudes, the same blindness as CE); kept as an
        # experimentation knob. Best-snapshot and stage acceptance
        # remain energy-based either way. For the fast path use `rql`
        # (quasi-Newton) instead.
        objective = sys.argv[2] if len(sys.argv) > 2 else "rq"
        params, info = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=(1e-3, 5e-4, 3e-4, 1.5e-4), steps_per_stage=900,
            chunk=8192, mass_lam=3.0, grad_clip=1000.0,
            log_every=50, on_log=on_log, on_stage=on_stage,
            objective=objective, target_coef=tc,
            accept_fn=lambda prm: measure(prm, "rq acceptance"),
        )

    if cmd == "refit":
        # Round-5 magnitude-repair leg. The counterfactual diagnosis
        # (tools/c2h4_diag_counterfactual.py, diag_counterfactual.json):
        # the 27.4 mHa restricted gap of the 85.6% state is magnitude
        # mis-shaping of the rank-1k..100k tail (phases recover only
        # 2.2 mHa), and rq/CE/fidelity gradients are all exponentially
        # suppressed exactly there. support_vmc objective='refit'
        # regresses the profile directly on the known SCI vector
        # (offset-free la + CIRCULAR offset-free phase -- the polish's
        # absolute phase MSE fought the state's global phase, the
        # round-3 wreck mode), with exact-rq best-snapshots each iter
        # and sampled-full-energy stage acceptance.
        import scipy.sparse

        h_path = os.path.join(RUN_DIR, "h_support.npz")
        assert os.path.exists(h_path), (
            "run tools/build_c2h4_support_h.py first (host, CPU-only)"
        )
        h = scipy.sparse.load_npz(h_path)
        print(f"restricted H loaded: nnz={h.nnz}", flush=True)

        def on_log(row):
            print(f"  refit stage {row['stage']} iter {row['iter']:4d} "
                  f"rq {row['rq']:+.6f} ({corr(row['rq']):.2f}% corr) "
                  f"loss {row.get('refit_loss', float('nan')):.6f} "
                  f"mass {row['mass']:.6f} best {row['best_rq']:+.6f} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

        refit_base = 60 + sum(
            1 for s in results.get("stages", []) if s["stage"] >= 60
        )

        def on_stage(row, prm):
            si = refit_base + row["stage"]
            ck = None
            if row.get("accepted", True):
                ck = os.path.join(RUN_DIR, f"ckpt_{si}")
                vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
            commit_row({
                "stage": si, "lr": row["lr"], "full_e": row["energy"],
                "corr_pct": corr(row["energy"]),
                "best_rq": row["best_rq"],
                "rq_corr_pct": corr(row["best_rq"]),
                "accepted": row.get("accepted"), "precision": "highest",
                "optimizer": "refit",
            }, ck)

        # rq_refit + clamp + low lr (q11_refit attempt-1 live lesson:
        # pure refit at lr 3e-4 with unclamped residuals collapsed rq
        # -78.19 -> -77.2 in 75 steps, mass leaked to 0.92 -- the mixed
        # pull keeps the rq gradient guarding the top rows while the
        # clamped tempered term un-starves the tail).
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
        # Live-tunable knobs (q12_refit live lesson: even the clamped
        # mixed pull at beta=1 lr 1e-4 collapsed rq 85.8% -> 9.5% corr
        # in 50 iters -- the aggregate tail pull of ~100k rows coherently
        # overwhelms the rq guard in parameter space; the repair must be
        # a PERTURBATION, beta << 1, at polish-scale lr).
        beta = float(os.environ.get("ANQS_REFIT_BETA", "0.05"))
        clip_r = float(os.environ.get("ANQS_REFIT_CLIP", "1.0"))
        lrs_r = tuple(
            float(x) for x in
            os.environ.get("ANQS_REFIT_LRS", "3e-5").split(",")
        )
        params, info = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=lrs_r, steps_per_stage=steps,
            chunk=8192, mass_lam=30.0, grad_clip=1000.0,
            log_every=25, on_log=on_log, on_stage=on_stage,
            objective="rq_refit", refit_clip=clip_r, refit_beta=beta,
            target_coef=tc,
            accept_fn=lambda prm: measure(prm, "refit acceptance"),
        )

    if cmd == "repair":
        # Round-5 repair CHAIN (q12_refit2 live lesson): a refit wave
        # necessarily RAISES rq while it un-starves the tail, so (a)
        # its snapshot is selected by refit LOSS (select='loss',
        # support_vmc), (b) it runs UNGUARDED (accept_fn=None -- its
        # endpoint alone always measures worse than the incumbent), and
        # (c) the follow-on rq Adam wave re-descends the energy with
        # now-visible tail gradients, guarded against the GLOBAL
        # incumbent (accept_baseline): a chain that ends below the
        # incumbent ships nothing.
        import scipy.sparse

        h_path = os.path.join(RUN_DIR, "h_support.npz")
        assert os.path.exists(h_path), (
            "run tools/build_c2h4_support_h.py first (host, CPU-only)"
        )
        h = scipy.sparse.load_npz(h_path)
        print(f"restricted H loaded: nnz={h.nnz}", flush=True)
        incumbent = best_row["full_e"]
        print(f"incumbent sampled full energy {incumbent:+.6f} "
              f"({corr(incumbent):.2f}% corr)", flush=True)

        beta = float(os.environ.get("ANQS_REFIT_BETA", "0.05"))
        clip_r = float(os.environ.get("ANQS_REFIT_CLIP", "1.0"))
        r_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
        q_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 300

        def on_log(row):
            extra = (f" loss {row['refit_loss']:.6f}"
                     if "refit_loss" in row else "")
            print(f"  repair stage {row['stage']} iter {row['iter']:4d} "
                  f"rq {row['rq']:+.6f} ({corr(row['rq']):.2f}% corr)"
                  f"{extra} mass {row['mass']:.6f} "
                  f"best {row['best_rq']:+.6f} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

        params, _ = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=(float(os.environ.get("ANQS_REFIT_LR", "3e-5")),),
            steps_per_stage=r_steps,
            chunk=8192, mass_lam=30.0, grad_clip=1000.0,
            log_every=25, on_log=on_log, on_stage=None,
            objective="rq_refit", refit_clip=clip_r, refit_beta=beta,
            target_coef=tc, select="loss", accept_fn=None,
        )
        print("refit leg done; rq re-descent from the repaired state",
              flush=True)

        repair_base = 70 + sum(
            1 for s in results.get("stages", []) if s["stage"] >= 70
        )

        def on_stage(row, prm):
            si = repair_base + row["stage"]
            ck = None
            if row.get("accepted"):
                ck = os.path.join(RUN_DIR, f"ckpt_{si}")
                vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
            commit_row({
                "stage": si, "lr": row["lr"], "full_e": row["energy"],
                "corr_pct": corr(row["energy"]),
                "best_rq": row["best_rq"],
                "rq_corr_pct": corr(row["best_rq"]),
                "accepted": row.get("accepted"), "precision": "highest",
                "optimizer": "repair",
            }, ck)

        params, info = support_ci.support_vmc(
            vmc.anqs, params, target, h, mol.e_nuc,
            lrs=(3e-4, 1e-4), steps_per_stage=q_steps,
            chunk=8192, mass_lam=3.0, grad_clip=1000.0,
            log_every=25, on_log=on_log, on_stage=on_stage,
            accept_baseline=incumbent,
            accept_fn=lambda prm: measure(prm, "repair acceptance"),
        )

    if cmd == "rql":
        # Quasi-Newton wave: scipy L-BFGS-B on the exact restricted rq
        # (support_vmc_lbfgs; LiH A/B: ~140x less residual than Adam at
        # equal evals). Resumes from the best MEASURED stage; segments
        # are recorded as stages >= 40 with the same acceptance guard.
        import scipy.sparse

        h_path = os.path.join(RUN_DIR, "h_support.npz")
        assert os.path.exists(h_path), (
            "run tools/build_c2h4_support_h.py first (host, CPU-only)"
        )
        h = scipy.sparse.load_npz(h_path)
        print(f"restricted H loaded: nnz={h.nnz}", flush=True)

        def on_log(row):
            print(f"  rql eval {row['eval']:5d} rq {row['rq']:+.6f} "
                  f"({corr(row['rq']):.2f}% corr) mass {row['mass']:.6f} "
                  f"best {row['best_rq']:+.6f} "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

        rql_base = 40 + sum(
            1 for s in results.get("stages", []) if s["stage"] >= 40
        )

        def on_stage(row, prm):
            si = rql_base + row["stage"]
            ck = None
            if row.get("accepted", True):
                ck = os.path.join(RUN_DIR, f"ckpt_{si}")
                vmc.save_checkpoint(ck, prm, vmc.opt.init(prm), key, si)
            commit_row({
                "stage": si, "lr": 0.0, "full_e": row["energy"],
                "corr_pct": corr(row["energy"]),
                "best_rq": row["best_rq"],
                "rq_corr_pct": corr(row["best_rq"]),
                "accepted": row.get("accepted"), "precision": "highest",
                "optimizer": "lbfgs", "evals": row["evals"],
            }, ck)
            print(f"  rql stage {si} accepted={row.get('accepted')} "
                  f"full_e {row.get('energy', float('nan')):+.6f} "
                  f"({row['scipy_msg']})", flush=True)

        params, info = support_ci.support_vmc_lbfgs(
            vmc.anqs, params, target, h, mol.e_nuc,
            maxiter=int(sys.argv[2]) if len(sys.argv) > 2 else 2400,
            # Hinge mass barrier (support_vmc_lbfgs docstring): lam=3
            # constant-penalty strangled the line search; lam=0 leaked
            # 7e-4 mass whose ~3 Ha junk paid back the entire 2.2 mHa
            # rq gain (stage 41, sampled full energy unmoved); a WIDE
            # hinge (w=2e-4) anchored AT the warm-start mass is still
            # half-force at the start point and L-BFGS raises mass
            # instead of lowering rq (runs/logs/c2h4_rql3_overdamped.log
            # evals 25-100). Sharp wall
            # with tiny slack: floor = m0 - 3e-5, w = 1e-5 (interior
            # force lam*sigmoid(-3) ~ 1.4, full-energy cost of spending
            # the whole slack ~ 0.09 mHa at the measured ~3 Ha junk
            # energy).
            segment=200, chunk=8192, mass_lam=30.0, mass_width=1e-5,
            mass_slack=3e-5,
            log_every=25, on_log=on_log, on_stage=on_stage,
            accept_fn=lambda prm: measure(prm, "rql acceptance"),
        )

    if cmd == "confirm":
        # Li2O-style repeated confirmation of the best stage: 5
        # independent sampled full-energy measurements from the best
        # checkpoint (runs/li2o_sci/confirm_energies.npy counterpart).
        stages_l = results.get("stages", [])
        if not stages_l:
            print("confirm: no recorded stages", flush=True)
            return
        best_stage, ck = best_measured_ckpt()
        print(f"confirm: stage {best_stage['stage']} from {ck}",
              flush=True)
        params, _, key, _ = vmc.load_checkpoint(ck)
        es = np.array(
            [measure(params, f"confirm {i}") for i in range(5)]
        )
        np.save(os.path.join(RUN_DIR, "confirm_energies.npy"), es)
        print(f"confirm: mean {es.mean():+.6f} +/- {es.std():.6f} "
              f"({corr(es.mean()):.2f}% corr)", flush=True)

    best = results.get("best_full_e")
    if best is not None:
        print(f"BEST sampled full energy {best:.6f} = "
              f"{corr(best):.2f}% of CCSD(T) correlation "
              f"({(best - cisd) * 1e3:+.3f} mHa vs CISD)")


if __name__ == "__main__":
    main()
