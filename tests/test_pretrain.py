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
