"""Oracle-based A/B tests closing round-1 coverage gaps: BFState as the
sampler's exact partner, sign_structure, full-vs-proxy local energy, the
multinomial capacity-truncation bias, and a trained spin-system VMC run.

Reference analogues: BFQuantumState (bf_quantum_state.py:9-41) as A/B
oracle (SURVEY.md section 4(c)); use_sign_structure (abstract_anqs.py:70-109);
full local energy (pauli_observable.py:992-1105); TFI sandbox
(applications/spin_systems/experiments/stochastic/sandbox.py:1-106).
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.models.bf_state import BFState
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.sampling.sampler import (
    gumbel_top_k_sample,
    multinomial_sample,
)
from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
)


def build_anqs(n=8, n_elec=4, qpq=2, **cfg):
    masker = Masker(
        [
            particle_number_symmetry(n, n_elec),
            spin_projection_symmetry(n, 0),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=qpq)
    anqs = ANQS(grouping, AnqsConfig(**cfg))
    params = anqs.init(jax.random.PRNGKey(11))
    return masker, anqs, params


def all_states(n):
    x = np.array(
        list(itertools.product([0, 1], repeat=n)), dtype=np.int64
    )[:, ::-1]
    return np.ascontiguousarray(x)


def test_bf_state_is_sampler_oracle():
    """BFState built from the ANQS amplitudes reproduces (a) the gumbel
    sampler's support ranking and (b) the multinomial count distribution
    (chi^2 over the full 8-qubit sector)."""
    n = 8
    masker, anqs, params = build_anqs(n)
    x = all_states(n)
    words_all = bitops.pack(jnp.asarray(x))
    la, ph = anqs.log_psi(params, words_all)

    bf = BFState(n)
    bf_params = {"log_abs": jnp.asarray(la), "phase": jnp.asarray(ph)}
    probs = np.asarray(bf.probs(bf_params), dtype=np.float64)
    flat_idx = x @ (1 << np.arange(n))

    # (a) gumbel top-K unique states = exactly the sector (36 states for
    # C(4,2)^2), each reported log-prob matching the BFState probability.
    out = gumbel_top_k_sample(anqs, params, jax.random.PRNGKey(0), 36)
    valid = np.asarray(out.valid)
    assert valid.sum() == 36
    samp_idx = np.asarray(out.words[:, 0], dtype=np.int64)
    np.testing.assert_allclose(
        np.exp(np.asarray(out.log_probs)[valid]),
        probs[samp_idx[valid]],
        rtol=1e-3,
    )

    # (b) multinomial counts ~ BFState multinomial: compare both empirical
    # distributions to the exact one with a chi^2-style bound.
    budget = 1 << 14
    out_m = multinomial_sample(
        anqs, params, jax.random.PRNGKey(1), 64, budget
    )
    counts = np.zeros(2**n)
    counts[np.asarray(out_m.words[:, 0], np.int64)] = np.asarray(
        out_m.counts
    )
    assert int(out_m.dropped) == 0
    _, bf_counts = bf.sample_counts(bf_params, jax.random.PRNGKey(2), budget)
    bf_counts = np.asarray(bf_counts, dtype=np.float64)
    for emp in (counts, bf_counts):
        mask = probs > 20.0 / budget
        chi2 = np.sum(
            (emp[mask] - budget * probs[mask]) ** 2
            / (budget * probs[mask])
        )
        dof = mask.sum()
        assert chi2 < dof + 5.0 * np.sqrt(2.0 * dof)


def test_sign_structure_replaces_phase():
    """sign_structure: phases come from the fixed table; amplitudes keep
    the learned masked-autoregressive |psi| (reference use_sign_structure,
    abstract_anqs.py:70-109)."""
    n = 8
    rng = np.random.default_rng(0)
    table = np.pi * rng.integers(0, 2, size=2**n).astype(np.float64)
    masker = Masker(
        [
            particle_number_symmetry(n, 4),
            spin_projection_symmetry(n, 0),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=2)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(16,)),
                sign_structure=table)
    params = anqs.init(jax.random.PRNGKey(1))
    x = all_states(n)
    words = bitops.pack(jnp.asarray(x))
    la, ph = anqs.log_psi(params, words)
    flat = x @ (1 << np.arange(n))
    np.testing.assert_allclose(np.asarray(ph), table[flat], atol=1e-6)
    probs = np.exp(2 * np.asarray(la, np.float64))
    np.testing.assert_allclose(
        probs[masker.is_physical(x)].sum(), 1.0, rtol=5e-4
    )


def test_local_energy_full_agrees_with_proxy_on_full_sector():
    """When the sample covers the whole sector, the sample-aware proxy and
    the full (network-evaluated) local energies coincide row by row."""
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    vmc = VMC(
        mol,
        VMCConfig(sample_num=256, sampling_mode="gumbel",
                  qubit_per_qudit=3, seed=3),
        AnqsConfig(hidden_widths=(16,)),
    )
    params, _, key = vmc.init_state()
    from anqs_quantum_chemistry_tpu.ops import keys as keysmod
    from anqs_quantum_chemistry_tpu.sampling.sampler import sample

    words, _, valid, _ = sample(vmc.anqs, params, key, vmc.sampling_config)
    sentinel = jnp.full_like(words, bitops.UINT(0xFFFFFFFF))
    words = jnp.where(valid[:, None], words, sentinel)
    sw, _, sv = keysmod.sort_words(words, valid.astype(jnp.int32))
    sv = sv.astype(bool)
    assert int(sv.sum()) == 225  # full LiH sector captured
    la, ph = vmc.anqs.log_psi(params, sw)
    e_proxy = vmc.engine.local_energy_proxy(sw, la, ph, sv)
    e_full = vmc.engine.local_energy_full(
        vmc.anqs, params, sw, la, ph, sv, amp_chunk=2048
    )
    np.testing.assert_allclose(
        np.asarray(e_proxy.e_re)[np.asarray(sv)],
        np.asarray(e_full.e_re)[np.asarray(sv)],
        rtol=2e-4, atol=2e-5,
    )


def test_multinomial_truncation_bias_bounded():
    """budget >> capacity: dropped counts are reported and the captured
    distribution still matches the exact one on the kept states."""
    n = 8
    masker, anqs, params = build_anqs(n)
    x = all_states(n)
    words_all = bitops.pack(jnp.asarray(x))
    la, _ = anqs.log_psi(params, words_all)
    probs = np.exp(2 * np.asarray(la, np.float64))
    flat_order = np.argsort(-probs)

    k_cap = 16  # < 36 sector states: forced truncation
    budget = 1 << 14
    out = multinomial_sample(
        anqs, params, jax.random.PRNGKey(5), k_cap, budget
    )
    kept = int(jnp.sum(out.counts))
    dropped = int(out.dropped)
    assert kept + dropped == budget
    # The dropped tail is bounded by the combined probability mass outside
    # the top-k_cap states (up to sampling noise).
    tail_mass = probs[flat_order[k_cap:]].sum()
    assert dropped <= budget * (tail_mass + 4 * np.sqrt(tail_mass / budget) + 50.0 / budget)
    # Captured states' empirical frequencies track their exact probabilities.
    samp_idx = np.asarray(out.words[:, 0], np.int64)
    valid = np.asarray(out.valid)
    emp = np.asarray(out.counts, np.float64)[valid] / budget
    np.testing.assert_allclose(
        emp, probs[samp_idx[valid]], atol=6.0 * np.sqrt(probs.max() / budget)
    )


def test_tfi_vmc_trains_to_exact_energy():
    """10-site TFI trained through the full VMC stack reaches the exact
    ground energy (the reference's spin sandbox actually trains;
    spin_systems/.../sandbox.py:1-106)."""
    from anqs_quantum_chemistry_tpu.applications.spin_systems import (
        exact_ground_energy,
        tfi_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.symmetries import idle_symmetry

    n = 10
    ham = tfi_hamiltonian(n, j=1.0, h=1.0)  # critical point
    e_exact = exact_ground_energy(ham)
    masker = Masker([idle_symmetry(n)])
    vmc = VMC(
        ham=ham,
        masker=masker,
        ref_det=0,
        config=VMCConfig(
            sample_num=1024, sampling_mode="gumbel", qubit_per_qudit=2,
            lr=1e-2, iter_num=1000, seed=0, symmetry_level="no_sym",
        ),
        anqs_config=AnqsConfig(hidden_widths=(64,)),
    )
    _, _, history, best = vmc.run(checkpoint_every=None, steps_per_call=50)
    # Full basis sampled (exact Rayleigh quotient): within 0.5% of the
    # exact critical-point ground energy, variational from below.
    assert best["energy"] < e_exact + 0.005 * abs(e_exact)
    assert best["energy"] > e_exact - 1e-3
    assert history[-1]["energy_var"] < 0.1


def test_xxz_vmc_trains_toward_exact_energy():
    """8-site Heisenberg XXZ in the Sz=0 sector trained through the full
    stack: the phase net must learn the Marshall sign structure (unlike
    the stoquastic-after-shift TFI case)."""
    from anqs_quantum_chemistry_tpu.applications.spin_systems import (
        exact_ground_energy,
        heisenberg_xxz_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.symmetries import (
        particle_number_symmetry,
    )

    n = 8
    ham = heisenberg_xxz_hamiltonian(n, jxy=1.0, jz=1.0)
    e_exact = exact_ground_energy(ham)
    masker = Masker([particle_number_symmetry(n, n // 2)])  # Sz = 0
    vmc = VMC(
        ham=ham,
        masker=masker,
        ref_det=sum(1 << i for i in range(0, n, 2)),  # Neel state
        config=VMCConfig(
            sample_num=128, sampling_mode="gumbel", qubit_per_qudit=2,
            lr=1e-2, iter_num=1200, seed=0, symmetry_level="no_sym",
        ),
        anqs_config=AnqsConfig(hidden_widths=(64,)),
    )
    _, _, history, best = vmc.run(checkpoint_every=None, steps_per_call=50)
    # 70-state sector fully sampled: exact Rayleigh quotient, variational
    # from below, within 1% of the exact ground energy.
    assert best["energy"] < e_exact + 0.01 * abs(e_exact)
    assert best["energy"] > e_exact - 1e-3
