"""End-to-end support-CI closure pipeline (experiments/support_ci.py)
on LiH: enrich -> distill -> polish -> measure, all on CPU."""

import numpy as np
import jax
import pytest

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem import selected_ci as sci
from anqs_quantum_chemistry_tpu.experiments import support_ci as scp
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


@pytest.mark.slow
def test_pipeline_reaches_near_fci_on_lih(tmp_path):
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()

    # Enrich from the state's own sample (random init: wide support).
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    assert e0 < mol.fci_energy + 5e-6  # LiH: selected CI hits FCI

    target = scp.make_target(dets, coef, mol.qubit_num)
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((1500, 3e-3), (1500, 1e-3)), batch=4096,
    )
    e_mid, _ = scp.sampled_full_energy(vmc, params, key, 128)

    stage_rows = []
    params, info = scp.polish(
        vmc.anqs, params, target, temp=2.0, lam=30.0, kind="lin",
        lrs=(3e-4, 1e-4), steps=600, window=100, chunk=256,
        on_stage=lambda row, p: stage_rows.append(row),
    )
    assert len(info) == 2 and all(np.isfinite(r["loss"]) for r in info)
    # Mass concentrated on the enriched support.
    assert info[-1]["mass"] > 0.98

    e_fin, var = scp.sampled_full_energy(vmc, params, key, 128)
    # Row-chunked dispatch (HBM-gated path) must agree with one-shot.
    e_chk, var_chk = scp.sampled_full_energy(
        vmc, params, key, 128, row_chunk=32
    )
    # f32 accumulation order differs between the chunked and one-shot
    # reductions; 1e-6 Ha flaked at 1.057e-6 under full-suite ordering
    # (round-3 pytest log) -- this is a tolerance, not a correctness,
    # bound.
    assert abs(e_chk - e_fin) < 5e-6
    assert abs(var_chk - var) < 1e-4 * max(1.0, abs(var))
    # Within 5 mHa of FCI from a RANDOM init via the pipeline alone
    # (measured: ~2.2 mHa), variational, and the on-support oracle is
    # at least as good as the sampled estimator.
    assert mol.fci_energy - 1e-6 <= e_fin < mol.fci_energy + 5e-3
    e_sup = scp.support_rayleigh(mol, target, vmc.anqs, params)
    assert mol.fci_energy - 1e-6 <= e_sup <= e_fin + 1e-6


def test_support_vmc_reaches_restricted_ground_state():
    """support_vmc minimizes the exact restricted Rayleigh quotient:
    from a CISD-distilled warm start it must recover the restricted
    ground state (= FCI on LiH, where selected CI closes the space)
    to well under chemical accuracy, with rollback guards exercised."""
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    target = scp.make_target(dets, coef, mol.qubit_num)
    # CE-converged warm start (the realistic regime: distill saturates
    # its entropy floor, then the energy objective fixes the tail).
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((1500, 3e-3), (1500, 1e-3)), batch=4096,
    )
    h = fci_mod.sparse_hamiltonian(sorted(dets), mol.h1, mol.v)
    rqs = []
    params, info = scp.support_vmc(
        vmc.anqs, params, target, h, mol.e_nuc,
        lrs=(1e-3, 3e-4, 1e-4, 3e-5), steps_per_stage=600, chunk=256,
        mass_lam=1.0, grad_clip=1000.0, log_every=200,
        on_log=lambda row: rqs.append(row["rq"]),
    )
    assert rqs[-1] <= rqs[0]  # energy-aligned objective descends
    best = min(r["best_rq"] for r in info)
    # Measured 0.141 mHa on this recipe; the bound is 3x slack.
    assert best < e0 + 5e-4
    assert best >= e0 - 1e-6  # variational within the support
    # The returned params realize the best rq of the final stage
    # (real-projection oracle agrees with the complex rq to ~phase
    # residuals; both must sit within the same bound).
    e_sup = scp.support_rayleigh(mol, target, vmc.anqs, params)
    assert e_sup < e0 + 5e-4
    assert e_sup >= e0 - 1e-6


def test_support_vmc_overlap_objective_descends_energy():
    """objective='overlap' feeds the log-fidelity gradient against the
    known selected-CI vector through the same device surrogate; the
    exact rq (logged every step) must still descend, the fidelity must
    rise, and best-snapshot selection stays energy-based."""
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    target = scp.make_target(dets, coef, mol.qubit_num)
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((800, 3e-3),), batch=4096,
    )
    h = fci_mod.sparse_hamiltonian(sorted(dets), mol.h1, mol.v)
    rows = []
    params, info = scp.support_vmc(
        vmc.anqs, params, target, h, mol.e_nuc,
        lrs=(1e-3,), steps_per_stage=300, chunk=256,
        mass_lam=1.0, grad_clip=1000.0, log_every=50,
        objective="overlap", target_coef=coef,
        on_log=lambda row: rows.append(row),
    )
    fids = [r["fid"] for r in rows]
    rqs = [r["rq"] for r in rows]
    assert fids[-1] > fids[0] + 1e-3   # fidelity ascends materially
    assert fids[-1] > 0.97             # and approaches the target
    assert rqs[-1] < rqs[0]            # the exact energy follows
    best = min(r["best_rq"] for r in info)
    assert best >= e0 - 1e-6           # variational within the support
    assert best < rqs[0]               # strictly improves the warm start


def test_support_vmc_lbfgs_beats_adam_recipe():
    """Quasi-Newton support VMC (support_vmc_lbfgs) must land well
    under the 4-stage Adam ladder's measured 0.141 mHa residual in a
    fraction of the evals (LiH A/B: +0.0045 mHa at 662 evals vs Adam
    +0.62 at 600 iters), with segment restarts exercised."""
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    target = scp.make_target(dets, coef, mol.qubit_num)
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((1500, 3e-3), (1500, 1e-3)), batch=4096,
    )
    h = fci_mod.sparse_hamiltonian(sorted(dets), mol.h1, mol.v)
    rows = []
    params, info = scp.support_vmc_lbfgs(
        vmc.anqs, params, target, h, mol.e_nuc,
        maxiter=400, segment=200, chunk=256, mass_lam=1.0,
        log_every=100, on_log=lambda r: rows.append(r),
    )
    assert len(info) >= 2  # segment restarts exercised
    best = min(r["best_rq"] for r in info)
    assert best >= e0 - 1e-6          # variational within the support
    # Measured +0.081 mHa here (mass_lam=1.0 shifts the stationary
    # point off the pure rq minimum; the lam=0 A/B reached +0.0064 at
    # the same eval count) -- still under the 4-stage Adam ladder's
    # measured 1.41e-4 residual at 1/6 the evals.
    assert best < e0 + 1.2e-4
    assert rows[-1]["mass"] > 0.98    # leak penalty holds the mass


def test_support_vmc_refit_objective_repairs_profile():
    """objective='refit' (round-5): tempered log-profile + CIRCULAR
    offset-free phase regression against the known selected-CI vector.
    Its gradients scale with the tempered target weight, not the
    network's own (possibly exponentially starved) amplitudes -- the
    C2H4 counterfactual diagnosis showed rq/CE/fidelity gradients all
    vanish exactly on the starved tail rows. From a short CE warm start
    the exact rq must descend materially and the refit loss must drop;
    a global phase on the state must NOT be penalized (the polish's
    absolute phase MSE was the round-3 wreck mode)."""
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    target = scp.make_target(dets, coef, mol.qubit_num)
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((800, 3e-3),), batch=4096,
    )
    h = fci_mod.sparse_hamiltonian(sorted(dets), mol.h1, mol.v)
    rows = []
    params, info = scp.support_vmc(
        vmc.anqs, params, target, h, mol.e_nuc,
        lrs=(1e-3,), steps_per_stage=300, chunk=256,
        mass_lam=1.0, grad_clip=1000.0, log_every=50,
        objective="refit", target_coef=coef,
        on_log=lambda row: rows.append(row),
    )
    losses = [r["refit_loss"] for r in rows]
    rqs = [r["rq"] for r in rows]
    assert losses[-1] < losses[0] * 0.5   # the profile fit converges
    best = min(r["best_rq"] for r in info)
    assert best >= e0 - 1e-6              # variational within the support
    # The refit is a REPAIR stage, not a closer: a perfectly-converged
    # tempered profile fit still leaves 10s of mHa on the table (the
    # tempered metric is not the energy metric -- measured on this toy:
    # loss 4.5e-4 with rq 80 mHa above e0), so the assertion is a
    # MATERIAL energy descent from the CE start, after which rq/rql
    # optimizers take over with un-starved gradients.
    assert best < rqs[0] - 0.02


def test_support_vmc_repair_chain_select_and_baseline():
    """The round-5 repair-chain contract (q12_refit2 live lesson):

    1. select='loss' -- a refit wave RAISES rq while it un-starves the
       tail, so under the default best-rq snapshot its endpoint is
       always discarded (the wave is a structural no-op). With
       select='loss' the returned params are the best-LOSS snapshot:
       materially different from the start and with a lower refit loss.
    2. accept_baseline -- the follow-on energy wave is guarded against
       the GLOBAL incumbent: with an unbeatable baseline, every stage
       is rejected and the returned params are the incumbent (start)
       params bit-for-bit.
    """
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=128, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, _, key = vmc.init_state()
    seed_dets, key = scp.sample_support(vmc, params, key, 128, passes=2)
    e0, dets, coef = sci.selected_ci(
        seed_dets, mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3,
        tol=1e-8,
    )
    target = scp.make_target(dets, coef, mol.qubit_num)
    params = scp.distill(
        vmc.anqs, params, target, jax.random.PRNGKey(1),
        stages=((400, 3e-3),), batch=4096,
    )
    h = fci_mod.sparse_hamiltonian(sorted(dets), mol.h1, mol.v)

    rows = []
    out, info = scp.support_vmc(
        vmc.anqs, params, target, h, mol.e_nuc,
        lrs=(1e-3,), steps_per_stage=60, chunk=256,
        mass_lam=1.0, grad_clip=1000.0, log_every=10,
        objective="rq_refit", refit_clip=1.0, refit_beta=0.05,
        target_coef=coef, select="loss",
        on_log=lambda row: rows.append(row),
    )
    assert info[0]["best_loss"] <= rows[0]["refit_loss"]
    l0 = jax.tree_util.tree_leaves(params)
    l1 = jax.tree_util.tree_leaves(out)
    assert any(
        not np.allclose(a, b) for a, b in zip(l0, l1)
    ), "select='loss' must return the moved (repaired) params"

    # Unbeatable baseline: every stage rejected, incumbent returned.
    out2, info2 = scp.support_vmc(
        vmc.anqs, params, target, h, mol.e_nuc,
        lrs=(1e-3,), steps_per_stage=30, chunk=256,
        mass_lam=1.0, grad_clip=1000.0, log_every=10,
        accept_baseline=-1e9,
        accept_fn=lambda prm: 0.0,
    )
    assert all(r["accepted"] is False for r in info2)
    l2 = jax.tree_util.tree_leaves(out2)
    assert all(np.allclose(a, b) for a, b in zip(l0, l2))
