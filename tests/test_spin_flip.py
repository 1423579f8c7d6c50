"""Spin-flip (alpha<->beta) symmetrization: ansatz-level and sample-set-level.

Reference behaviors covered (SpinFlipSymmetryConfig, abstract_anqs.py:53-67;
conditional coupling :320-326; phase coupling + reordering sign :466-474;
sample-set closure calculations/sample.py:88-99).
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
)


def all_states(n):
    x = np.array(
        list(itertools.product([0, 1], repeat=n)), dtype=np.int64
    )[:, ::-1]
    return np.ascontiguousarray(x)


def flip_bits(x):
    """alpha<->beta swap on an (B, n) bit array (even/odd interleaved)."""
    out = x.copy()
    out[:, 0::2] = x[:, 1::2]
    out[:, 1::2] = x[:, 0::2]
    return out


def build(n=8, n_elec=4, qpq=2, **cfg):
    masker = Masker(
        [
            particle_number_symmetry(n, n_elec),
            spin_projection_symmetry(n, 0),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=qpq)
    anqs = ANQS(grouping, AnqsConfig(**cfg))
    params = anqs.init(jax.random.PRNGKey(3))
    return masker, anqs, params


def test_spin_flip_abs_exact_invariance():
    """|psi(flip x)| == |psi(x)| exactly, on every physical 8-qubit state."""
    n = 8
    masker, anqs, params = build(n, spin_flip_abs=True)
    x = all_states(n)
    phys = masker.is_physical(x)
    x = x[phys]
    words = bitops.pack(jnp.asarray(x))
    words_f = bitops.pack(jnp.asarray(flip_bits(x)))
    la, _ = anqs.log_psi(params, words)
    la_f, _ = anqs.log_psi(params, words_f)
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(la_f), rtol=0, atol=2e-5
    )
    # Still a normalized distribution over the physical sector.
    probs = np.exp(2 * np.asarray(la, dtype=np.float64))
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=5e-4)


def test_spin_flip_abs_off_is_not_invariant():
    """Sanity: without the flag the network is generically asymmetric."""
    n = 8
    masker, anqs, params = build(n, spin_flip_abs=False)
    x = all_states(n)
    x = x[masker.is_physical(x)]
    la, _ = anqs.log_psi(params, bitops.pack(jnp.asarray(x)))
    la_f, _ = anqs.log_psi(params, bitops.pack(jnp.asarray(flip_bits(x))))
    assert np.abs(np.asarray(la) - np.asarray(la_f)).max() > 1e-3


def test_spin_flip_phase_sign_relation():
    """psi(flip x) == (-1)**(n_open//2) psi(x) with abs+phase coupling.

    n_open = number of singly-occupied orbitals; the sign is the fermionic
    parity of reversing the alpha<->beta labels (reference pi_mult,
    abstract_anqs.py:470-471).
    """
    n = 8
    masker, anqs, params = build(
        n, spin_flip_abs=True, spin_flip_phase=True
    )
    x = all_states(n)
    x = x[masker.is_physical(x)]
    xf = flip_bits(x)
    la, ph = anqs.log_psi(params, bitops.pack(jnp.asarray(x)))
    la_f, ph_f = anqs.log_psi(params, bitops.pack(jnp.asarray(xf)))
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(la_f), rtol=0, atol=2e-5
    )
    n_open = (x != xf).sum(axis=1) // 2
    expected_sign = np.where((n_open // 2) % 2 == 1, -1.0, 1.0)
    re = np.exp(np.asarray(la)) * np.cos(np.asarray(ph))
    re_f = np.exp(np.asarray(la_f)) * np.cos(np.asarray(ph_f))
    im = np.exp(np.asarray(la)) * np.sin(np.asarray(ph))
    im_f = np.exp(np.asarray(la_f)) * np.sin(np.asarray(ph_f))
    np.testing.assert_allclose(re_f, expected_sign * re, atol=2e-5)
    np.testing.assert_allclose(im_f, expected_sign * im, atol=2e-5)


def test_spin_flip_sampler_matches_log_psi():
    """Gumbel sampling with a flip-symmetrized ansatz draws from |psi|^2:
    every sampled state's reported log-prob matches log_psi evaluation."""
    from anqs_quantum_chemistry_tpu.sampling.sampler import (
        gumbel_top_k_sample,
    )

    n = 8
    masker, anqs, params = build(n, spin_flip_abs=True)
    out = gumbel_top_k_sample(anqs, params, jax.random.PRNGKey(7), 36)
    valid = np.asarray(out.valid)
    la, _ = anqs.log_psi(params, out.words)
    # 36 states = full sector for C(4,2)^2: renormalized log-probs equal
    # 2*log|psi| exactly.
    np.testing.assert_allclose(
        np.asarray(out.log_probs)[valid],
        2.0 * np.asarray(la)[valid],
        atol=2e-4,
    )


def test_couple_spin_flip_closure_and_energy_invariance():
    """VMC step with couple_spin_flip: the evaluated sample set is closed
    under the flip, and with a flip-symmetric ansatz the energy equals the
    un-coupled energy on the same (already-closed) support."""
    from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    mol = Molecule.create(
        MolConfig(name="H2"), mols_dir="mols", run_fci=True, run_cisd=False
    )
    common = dict(
        sample_num=16,
        sampling_mode="gumbel",
        qubit_per_qudit=2,
        lr=1e-3,
        seed=5,
    )
    anqs_cfg = AnqsConfig(hidden_widths=(16,), spin_flip_abs=True)
    vmc_a = VMC(mol, VMCConfig(couple_spin_flip=True, **common), anqs_cfg)
    vmc_b = VMC(mol, VMCConfig(couple_spin_flip=False, **common), anqs_cfg)
    pa, oa, ka = vmc_a.init_state()
    _, _, _, metrics_a = vmc_a._step(pa, oa, ka)
    _, _, _, metrics_b = vmc_b._step(pa, oa, ka)
    # H2/STO-3G sector has 4 states; 16 Gumbel samples capture all of them,
    # so the closure adds nothing and the Born-reweighted energies agree.
    assert float(metrics_a["energy"]) < mol.hf_energy + 1.0
    np.testing.assert_allclose(
        float(metrics_a["energy"]), float(metrics_b["energy"]), atol=1e-5
    )
    # Both are real-Hamiltonian expectation values over the full sector:
    # they must match the Rayleigh quotient, i.e. lie above FCI.
    assert float(metrics_a["energy"]) > mol.fci_energy - 1e-6
