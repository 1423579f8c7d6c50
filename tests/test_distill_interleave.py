"""Distillation-interleaved VMC (Li2O closure lever #2).

No reference counterpart -- a TPU-rebuild capability on top of parity
(like optim/pretrain.py). Covers: the imaginary-time target builder
against a dense (1 - tau(H - E))|psi> oracle, supervised-loss descent of
one cycle, the run() interleave (cycle cadence, CSV columns, scan-window
clipping at distill boundaries), and pure self-distillation driving the
energy toward FCI with the VMC optimizer disabled.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import (
    VMC,
    VMCConfig,
    it_targets,
)
from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig as _AC  # noqa
from anqs_quantum_chemistry_tpu.observables import PauliEngine
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.ops import keys
from anqs_quantum_chemistry_tpu.experiments.preparation import create_masker
from anqs_quantum_chemistry_tpu.symmetries import QubitGrouping


def test_it_targets_match_dense_oracle():
    """la/ph targets == log|phi|, arg(phi) for phi = (1-tau(H-E))psi,
    with E the Born (= Rayleigh, full sector) energy."""
    mol = Molecule.create(MolConfig(name="LiH", basis="sto-3g"),
                          mols_dir="mols")
    masker = create_masker(mol, "e_num_spin")
    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(16,)))
    params = anqs.init(jax.random.PRNGKey(3))
    engine = PauliEngine(mol.qubit_ham)
    dets = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    bits = np.array(
        [[(d >> i) & 1 for i in range(mol.qubit_num)] for d in dets]
    )
    words = bitops.pack(jnp.asarray(bits))
    sorted_words, _ = keys.sort_words(words)
    valid = jnp.ones((len(dets),), bool)
    la, ph = anqs.log_psi(params, sorted_words)
    e = engine.local_energy_proxy(sorted_words, la, ph, valid)

    tau = 0.07
    la_t, ph_t, m_re = it_targets(la, ph, e.e_re, e.e_im, valid, tau)

    # Dense oracle in the sorted order.
    h = np.array(
        [[mol.qubit_ham.dense_matrix_element(x, y) for x in dets]
         for y in dets]
    )
    sorted_bits = np.asarray(bitops.unpack(sorted_words, mol.qubit_num))
    sorted_dets = [
        int(sum(int(bb) << i for i, bb in enumerate(row)))
        for row in sorted_bits
    ]
    pos = {d: i for i, d in enumerate(dets)}
    perm = np.array([pos[d] for d in sorted_dets])
    h = h[np.ix_(perm, perm)]
    psi = np.exp(np.asarray(la, np.float64)) * np.exp(
        1j * np.asarray(ph, np.float64)
    )
    rayleigh = (psi.conj() @ h @ psi).real / (np.abs(psi) ** 2).sum()
    np.testing.assert_allclose(float(m_re), rayleigh, rtol=1e-4)
    phi = psi - tau * (h @ psi - rayleigh * psi)
    np.testing.assert_allclose(
        np.asarray(la_t, np.float64), np.log(np.abs(phi)),
        rtol=2e-4, atol=2e-4,
    )
    # Phase compared on the unit circle (branch-free).
    np.testing.assert_allclose(
        np.exp(1j * np.asarray(ph_t, np.float64)), phi / np.abs(phi),
        atol=5e-4,
    )


def _make_vmc(tmp_path=None, **cfg):
    mol = Molecule.create(
        MolConfig(name="H2"), mols_dir="mols", run_fci=True, run_cisd=False
    )
    defaults = dict(
        sample_num=8, sampling_mode="gumbel", qubit_per_qudit=2,
        lr=5e-3, seed=1,
    )
    defaults.update(cfg)
    return mol, VMC(
        mol,
        VMCConfig(**defaults),
        AnqsConfig(hidden_widths=(16,)),
        run_dir=str(tmp_path) if tmp_path else None,
    )


@pytest.mark.parametrize("loss", ["ce", "logmse"])
def test_cycle_decreases_supervised_loss(loss):
    _, vmc = _make_vmc(
        sampling_mode="exact",
        distill_period=10, distill_steps=40, distill_tau=0.1,
        distill_lr=3e-3, distill_loss=loss, distill_temperature=4.0,
    )
    params, _, key = vmc.init_state()
    dcall, dopt = vmc._get_distill()
    dstate = dopt.init(params)
    _, _, _, dmet = dcall(params, dstate, key)
    first = float(dmet["distill_loss_first"])
    last = float(dmet["distill_loss_last"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_run_interleaves_cycles_and_logs(tmp_path):
    """Cycles fire at multiples of the period; their metrics ride on the
    next row; scan windows are clipped at distill boundaries."""
    _, vmc = _make_vmc(
        tmp_path,
        iter_num=7,
        distill_period=3, distill_steps=5, distill_tau=0.1,
    )
    calls = []
    orig = vmc._distill_body

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    vmc._distill_body = spy
    _, _, history, best = vmc.run(checkpoint_every=None, steps_per_call=4)
    # Traced once per compiled cycle program; cadence is visible in the
    # CSV columns instead.
    assert len(calls) >= 1
    assert len(history) == 7
    got = [
        it for it, h in enumerate(history)
        if np.isfinite(h["distill_loss_first"])
    ]
    assert got == [3, 6]
    for it in got:
        assert np.isfinite(history[it]["distill_energy"])
    assert np.isfinite(best["energy"])
    # CSV got the distill columns.
    import csv

    with open(tmp_path / "result.csv") as f:
        cols = next(csv.reader(f))
    assert "distill_loss_last" in cols and "distill_energy" in cols


def test_pure_self_distillation_descends_energy():
    """With the VMC optimizer disabled (lr=0), interleaved cycles alone
    are a supervised power iteration: the Born energy must drop toward
    FCI from the random init."""
    mol, vmc = _make_vmc(
        sampling_mode="exact",
        lr=0.0,
        iter_num=13,
        distill_period=1, distill_steps=60, distill_tau=0.25,
        distill_lr=3e-3,
    )
    _, _, history, best = vmc.run(checkpoint_every=None)
    e0 = history[0]["energy"]
    e_last = history[-1]["energy"]
    assert e_last < e0 - 0.05  # clear descent, not noise
    assert e_last > mol.fci_energy - 1e-6  # variational
    # Most of the gap from the random init to FCI is closed.
    assert (e_last - mol.fci_energy) < 0.35 * (e0 - mol.fci_energy)
