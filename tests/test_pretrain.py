"""CISD-amplitude pretraining (optim/pretrain.py): the warm-started
ansatz reproduces the CISD state before any VMC step."""

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


def test_cisd_pretrain_reaches_cisd_energy():
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False
    )
    hf_det = int(np.asarray(mol.hf_det).ravel()[0])
    e_cisd, dets, coef = fci_mod.cisd_ground_state(
        mol.h1, mol.v, hf_det, mol.e_nuc
    )
    probs, phases = amplitude_targets_from_coefs(coef)
    words = pack_dets(dets, mol.qubit_num)

    vmc = VMC(
        mol,
        VMCConfig(sampling_mode="exact", qubit_per_qudit=3, seed=0),
        AnqsConfig(hidden_widths=(128,)),
    )
    params, _, _ = vmc.init_state()
    key = jax.random.PRNGKey(0)
    first_loss = None
    for iters, lr in ((1500, 2e-3), (1500, 5e-4)):
        params, hist = pretrain(
            vmc.anqs, params, words, probs, phases, key,
            iters=iters, lr=lr,
        )
        first_loss = first_loss if first_loss is not None else (
            hist[0]["loss"]
        )
    assert hist[-1]["loss"] < first_loss

    # Exact f64 Rayleigh quotient of the pretrained state over the full
    # sector: must sit within a few mHa of the CISD energy (and far
    # below HF) with NO VMC steps taken.
    la, ph = vmc.anqs.log_psi(params, vmc.exact_words)
    e = vmc.engine.local_energy_static(
        vmc.exact_words, la, ph, vmc.exact_valid,
        vmc.exact_partner_idx, vmc.exact_partner_found,
    )
    valid = np.asarray(vmc.exact_valid)
    a = np.where(valid, np.exp(np.asarray(la, np.float64)), 0.0)
    # Complex numerators: t = a * e_loc (re, im); signs live in phases.
    t_re = np.asarray(e.t_re, np.float64)
    energy = float(np.sum(a * t_re) / np.sum(a * a))
    # Below HF and within ~20 mHa of CISD with zero VMC steps: the
    # residual gap is stray off-support mass that VMC then removes
    # variationally (the warm start's job is to escape the HF peak, not
    # to be the final answer).
    assert energy < mol.hf_energy - 3e-3, (energy, mol.hf_energy)
    assert abs(energy - e_cisd) < 2e-2, (energy, e_cisd)


def test_pretrain_keep_best_rolls_back_divergence():
    """A deliberately divergent stage (huge lr) must return the best
    snapshot, not the blown-up final params (the H2O-transformer rerun
    failure mode: CE 0.188 -> 0.428 mid-distillation, never recovering,
    then VMC collapses to HF from the broken warm start)."""
    mol = Molecule.create(
        MolConfig(name="H2"), mols_dir="mols", run_fci=False
    )
    hf_det = int(np.asarray(mol.hf_det).ravel()[0])
    _, dets, coef = fci_mod.cisd_ground_state(
        mol.h1, mol.v, hf_det, mol.e_nuc
    )
    probs, phases = amplitude_targets_from_coefs(coef)
    words = pack_dets(dets, mol.qubit_num)

    vmc = VMC(
        mol,
        VMCConfig(sampling_mode="exact", qubit_per_qudit=2, seed=0),
        AnqsConfig(hidden_widths=(32,)),
    )
    params, _, _ = vmc.init_state()
    key = jax.random.PRNGKey(0)
    # Converge a little first, then blow it up.
    params, hist1 = pretrain(
        vmc.anqs, params, words, probs, phases, key, iters=300, lr=2e-3
    )
    best_after_1 = hist1[-1]["best_loss"]
    params_div, hist2 = pretrain(
        vmc.anqs, params, words, probs, phases, key, iters=200, lr=50.0
    )
    # The divergent stage's final per-step loss is far above its best
    # snapshot; the returned params must achieve (close to) the best.
    def loss_of(p):
        import jax.numpy as jnp
        la, ph = vmc.anqs.log_psi(p, jnp.asarray(words))
        import numpy as _np
        tp = _np.asarray(probs)
        ce = -2.0 * float((tp * _np.asarray(la, _np.float64)).sum())
        dph = _np.asarray(ph, _np.float64) - _np.asarray(phases)
        return ce + float((tp * dph * dph).sum())

    returned = loss_of(params_div)
    assert returned <= hist2[-1]["best_loss"] + 1e-3, (
        returned, hist2[-1]
    )
    # And it never got worse than where stage 1 left off.
    assert returned <= best_after_1 + 1e-3, (returned, best_after_1)
    # keep_best=False really returns the (diverged) final params.
    params_raw, hist3 = pretrain(
        vmc.anqs, params, words, probs, phases, key,
        iters=200, lr=50.0, keep_best=False,
    )
    assert loss_of(params_raw) > loss_of(params_div) + 0.1
