"""NADE and transformer ansatz variants: causality + masked normalization."""

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
)


def build(net_type, n=6):
    masker = Masker([particle_number_symmetry(n, 3)])
    grouping = QubitGrouping.create(masker, qubit_per_qudit=2)
    cfg = AnqsConfig(
        net_type=net_type,
        hidden_widths=(16,),
        aux_hidden_widths=(16,),
        d_model=16,
        n_heads=2,
        n_layers=1,
        d_ff=32,
    )
    anqs = ANQS(grouping, cfg)
    params = anqs.init(jax.random.PRNGKey(0))
    return masker, anqs, params


def check_normalization(net_type):
    n = 6
    masker, anqs, params = build(net_type, n)
    x = np.array(list(itertools.product([0, 1], repeat=n)), dtype=np.int64)[
        :, ::-1
    ]
    words = bitops.pack(jnp.asarray(np.ascontiguousarray(x)))
    la, _ = anqs.log_psi(params, words)
    probs = np.exp(2 * np.asarray(la, np.float64))
    phys = masker.is_physical(x)
    assert probs[~phys].max() < 1e-20
    np.testing.assert_allclose(probs[phys].sum(), 1.0, rtol=1e-3)

    # Causality: conditional for qudit q must ignore bits at qudits >= q,
    # so perturbing qudits >= 1 leaves outputs at qudits 0 and 1 unchanged.
    la1 = anqs.main_log_abs_raw(
        params, bitops.pack(jnp.asarray(np.ascontiguousarray(x[:4])))
    )
    x2 = x[:4].copy()
    x2[:, anqs.qudit_starts[1]:] ^= 1
    la2 = anqs.main_log_abs_raw(
        params, bitops.pack(jnp.asarray(np.ascontiguousarray(x2)))
    )
    np.testing.assert_allclose(
        np.asarray(la1[:, :2]), np.asarray(la2[:, :2]), atol=2e-5
    )


def test_nade_normalization_and_causality():
    check_normalization("nade")


def test_transformer_normalization_and_causality():
    check_normalization("transformer")


def test_ensemble_heads():
    """vmap-based multi-head ensemble: H independent heads evaluated in one
    batched call, each matching its individually-evaluated counterpart
    (replaces the reference MultiHeadLinear / multi-head MLP,
    multi_head_linear.py:6-31, multi_head_mlp.py:11-207)."""
    from anqs_quantum_chemistry_tpu.models.ensemble import (
        ensemble_init,
        ensemble_log_psi,
    )

    n, h = 6, 3
    masker, anqs, _ = build("made", n)
    stacked = ensemble_init(anqs, jax.random.PRNGKey(9), h)
    x = np.array(list(itertools.product([0, 1], repeat=n)), dtype=np.int64)[
        :, ::-1
    ][:12]
    words = bitops.pack(jnp.asarray(np.ascontiguousarray(x)))
    la_h, ph_h = ensemble_log_psi(anqs, stacked, words)
    assert la_h.shape == (h, 12)
    # Head i of the stack == the same params evaluated alone.
    for i in range(h):
        params_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
        la_i, ph_i = anqs.log_psi(params_i, words)
        np.testing.assert_allclose(
            np.asarray(la_h[i]), np.asarray(la_i), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ph_h[i]), np.asarray(ph_i), atol=1e-6
        )
    # Heads differ (independent initializations).
    assert np.abs(np.asarray(la_h[0] - la_h[1])).max() > 1e-3


def test_transformer_trains_below_hf():
    """The qudit-token transformer ANQS actually trains (round-1 gap: it
    was only construction-tested): on H2 it captures ~half the correlation
    energy within 400 iterations, ending clearly below HF."""
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig

    mol = Molecule.create(MolConfig(name="H2"), mols_dir="mols")
    vmc = VMC(
        mol,
        VMCConfig(sample_num=8, qubit_per_qudit=2, lr=5e-3,
                  iter_num=400, seed=0),
        AnqsConfig(net_type="transformer", d_model=32, n_heads=2,
                   n_layers=2, d_ff=64),
    )
    _, _, _, best = vmc.run(checkpoint_every=None, steps_per_call=50)
    assert best["energy"] < mol.hf_energy - 5e-3
    assert best["energy"] > mol.fci_energy - 1e-6
