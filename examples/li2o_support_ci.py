"""Li2O chemical-accuracy closure via selected-CI support enrichment.

The working fix for the +6.17 mHa Li2O plateau, built on the corrected
diagnosis (docs/DESIGN_NOTES.md, commit 27db8b4): the plateau is pure
SUPPORT QUALITY -- the trained state is the near-exact ground state of
H restricted to everything its sampler proposes, and the missing ~5 mHa
lives in determinants it assigns ~zero probability. Pipeline:

1. HOST enrichment (chem/selected_ci.py): sample the trained state's
   support, expand with singles+doubles of the top-|c| parents,
   diagonalize restricted H (C++ Slater-Condon builder + Lanczos).
   Measured: 21,327 sampled dets (+6.159 mHa) -> one 500-parent
   expansion -> 716,014 dets at +0.069 mHa vs FCI.
2. Truncate the enriched vector to the smallest top-K support within
   ~0.3 mHa of the full expansion (compact distillation target).
3. TPU distillation (optim/pretrain.py): staged-LR supervised fit of
   the warm NADE-(128,128) onto the enriched vector.
4. Measure the unbiased sampled full energy (the artifact protocol all
   ladder runs use) after every stage; keep the best checkpoint.

The final state is a bona-fide ANQS: the number reported is the full
local-energy estimator of the network, not a CI energy. No FCI oracle
is used anywhere (the selected-CI expansion sees only H and the
sampled seed).

Reference counterpart: none -- the reference's Li2O Colab converges
with plain SR in 500 iters (colab_toy_model.ipynb cells 15-28) because
at 20 qubits its 1e8-sample multinomial effectively enumerates the
sector; at 30 qubits top-k windows truncate and this enrichment is the
TPU-rebuild's answer. VERDICT round-2 item 3.

Usage: python examples/li2o_support_ci.py [stage_iters] [polish_iters]
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
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem import selected_ci as sci
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.pretrain import (
    amplitude_targets_from_coefs,
    pack_dets,
    pretrain,
)
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.ops import keys as keyops
from anqs_quantum_chemistry_tpu.sampling.sampler import gumbel_top_k_sample

FCI = -88.705450  # in-tree direct-CI anchor (runs/li2o_fci_summary.json)
RUN_DIR = "runs/li2o_sci"
TARGET = os.path.join(RUN_DIR, "target.npz")


def build_target(mol, vmc, params):
    """Host phase: sampled seed -> selected-CI expansion -> truncation."""
    probe = "/tmp/li2o_expanded_ci.npz"
    if os.path.exists(probe):
        d = np.load(probe)
        dets = [int(x) for x in d["dets"]]
        coef = np.asarray(d["coef"], np.float64)
        e_full = float(d["e0"])
        print(f"expansion loaded from {probe}: |S|={len(dets)} "
              f"E0={e_full:.6f} ({(e_full - FCI) * 1e3:+.3f} mHa)",
              flush=True)
    else:
        key = jax.random.PRNGKey(7)
        seed = set()
        for _ in range(3):
            key, sub = jax.random.split(key)
            s = jax.jit(
                lambda p, k: gumbel_top_k_sample(vmc.anqs, p, k, 16384)
            )(params, sub)
            w = np.asarray(s.words)[np.asarray(s.valid)]
            b = np.asarray(bitops.unpack(jnp.asarray(w), mol.qubit_num))
            seed.update(
                int(x) for x in
                (b.astype(np.uint64)
                 << np.arange(mol.qubit_num, dtype=np.uint64)).sum(1)
            )
        print(f"sampled seed support: {len(seed)}", flush=True)

        def log_round(r):
            print(f"  selected-CI round {r['round']}: |S|={r['size']} "
                  f"E={r['energy']:.6f} gain {r['gain'] * 1e3:.3f} mHa "
                  f"[{r['seconds']:.0f}s]", flush=True)

        e_full, dets, coef = sci.selected_ci(
            sorted(seed), mol.h1, mol.v, mol.e_nuc,
            n_parents=500, rounds=2, tol=2e-4, on_round=log_round,
        )

    # Truncate to the smallest power-of-two support within 0.3 mHa of
    # the full expansion.
    for k in (1 << 17, 1 << 18, 1 << 19):
        if k >= len(dets):
            td, tc, e_k = dets, np.asarray(coef, np.float64), e_full
            break
        td, tc = sci.truncate_by_weight(dets, coef, k)
        t0 = time.perf_counter()
        e_k, tc = sci.restricted_ground_state(td, mol.h1, mol.v, mol.e_nuc)
        print(f"top-{k}: E0={e_k:.6f} ({(e_k - FCI) * 1e3:+.3f} mHa) "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        if e_k - e_full < 3e-4:
            break
    os.makedirs(RUN_DIR, exist_ok=True)
    np.savez_compressed(
        TARGET, dets=np.array(td, np.uint64), coef=tc,
        e0=e_k, e0_full=e_full, n_full=len(dets),
    )
    return td, tc, e_k


def main():
    stage_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
    )
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=16384, sampling_mode="gumbel", qubit_per_qudit=6,
            seed=0,
            engine_overrides={
                "prefilter_row_capacity": 768,
                "prefilter_dense_rows": 4096,
            },
        ),
        AnqsConfig(net_type="nade", hidden_widths=(128, 128),
                   aux_hidden_widths=(128, 128)),
        run_dir=RUN_DIR,
    )

    # Warm start: our own latest checkpoint, else the closure plateau.
    def latest(d):
        if not os.path.isdir(d):
            return None
        cs = sorted(
            (c for c in os.listdir(d) if c.startswith("ckpt_")),
            key=lambda c: int(c.split("_")[1]),
        )
        return os.path.join(d, cs[-1]) if cs else None

    own = latest(RUN_DIR)
    src = own or "runs/li2o_closure/ckpt_16000"
    params, _, key, start_stage = vmc.load_checkpoint(src)
    if own:
        print(f"resuming from {own} (stage {start_stage})", flush=True)
    else:
        start_stage = 0
        print(f"warm start from {src}", flush=True)

    if os.path.exists(TARGET):
        d = np.load(TARGET)
        td = [int(x) for x in d["dets"]]
        tc = np.asarray(d["coef"], np.float64)
        e_k = float(d["e0"])
        print(f"target loaded: |S|={len(td)} E0={e_k:.6f} "
              f"({(e_k - FCI) * 1e3:+.3f} mHa)", flush=True)
    else:
        td, tc, e_k = build_target(mol, vmc, params)

    probs, phases = amplitude_targets_from_coefs(tc)
    words = pack_dets(td, mol.qubit_num)

    # --- sampled-full-energy measurement (the ladder-artifact protocol:
    # every connected amplitude of a fresh 16384-unique sample evaluated
    # through the network, Born-weighted f64 reduction).
    def full_energy(prm, tag):
        nonlocal key
        key, sub = jax.random.split(key)
        s = jax.jit(
            lambda p, k: gumbel_top_k_sample(vmc.anqs, p, k, 16384)
        )(prm, sub)
        # Gumbel top-16384 over Li2O's 41M-det sector is always full.
        assert bool(np.asarray(s.valid).all()), "sample not full"
        sw, _ = keyops.sort_words(s.words)
        la, ph = vmc.anqs.log_psi(prm, sw)
        valid = jnp.ones((sw.shape[0],), bool)
        e_re, _, var = vmc._full_energy(prm, sw, la, ph, valid)
        e = float(e_re)
        print(f"  [{tag}] sampled full energy {e:+.6f} "
              f"({(e - FCI) * 1e3:+.3f} mHa vs FCI) var {float(var):.2e}",
              flush=True)
        return e

    t0 = time.perf_counter()

    def plog(row):
        print(f"  distill {row['iter']:5d} loss {row['loss']:.6f} "
              f"ce {row['cross_entropy']:.6f} best {row['best_loss']:.6f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    stages = ((stage_iters, 3e-4), (stage_iters, 1e-4),
              (stage_iters, 3e-5), (stage_iters, 1e-5))
    results = {"target_e0": e_k, "target_size": len(td), "stages": []}
    best = (np.inf, None, -1)
    e0 = full_energy(params, "warm start")
    for si, (iters, lr) in enumerate(stages):
        if si < start_stage:
            continue
        params, _ = pretrain(
            vmc.anqs, params, words, probs, phases,
            jax.random.PRNGKey(100 + si), iters=iters, lr=lr,
            batch=8192, log_every=500, on_log=plog,
        )
        e = full_energy(params, f"stage {si} lr={lr:g}")
        ck = os.path.join(RUN_DIR, f"ckpt_{si + 1}")
        vmc.save_checkpoint(ck, params, vmc.opt.init(params), key, si + 1)
        results["stages"].append({"stage": si, "lr": lr, "full_e": e})
        if e < best[0]:
            best = (e, ck, si)
    results["best_full_e"] = best[0]
    results["best_stage"] = best[2]
    results["gap_mha"] = (best[0] - FCI) * 1e3
    with open(os.path.join(RUN_DIR, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(
        f"BEST sampled full energy {best[0]:.6f} "
        f"({results['gap_mha']:+.3f} mHa vs FCI; "
        f"{'CHEMICAL ACCURACY' if results['gap_mha'] < 1.6 else 'not yet'})"
    )


if __name__ == "__main__":
    main()
