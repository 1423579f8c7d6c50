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


def build(n=8, n_elec=4, twice_sz=0, qpq=3, **cfg):
    masker = Masker(
        [
            particle_number_symmetry(n, n_elec),
            spin_projection_symmetry(n, twice_sz),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=qpq)
    anqs = ANQS(grouping, AnqsConfig(**cfg))
    params = anqs.init(jax.random.PRNGKey(0))
    return masker, anqs, params


def test_normalization_and_support():
    n = 8
    masker, anqs, params = build(n)
    x = all_states(n)
    words = bitops.pack(jnp.asarray(x))
    la, ph = anqs.log_psi(params, words)
    la = np.asarray(la, dtype=np.float64)
    probs = np.exp(2 * la)
    phys = masker.is_physical(x)
    # Unphysical states carry zero amplitude.
    assert probs[~phys].max() < 1e-20
    # Masked autoregressive normalization: total mass over physical = 1
    # (float32 network -> ~1e-4 relative rounding).
    np.testing.assert_allclose(probs[phys].sum(), 1.0, rtol=5e-4)


def test_log_psi_head_modes_agree_on_shapes():
    n = 8
    for head_mode in ("log_abs_phase", "log_psi"):
        _, anqs, params = build(n, head_mode=head_mode)
        x = all_states(n)[:10]
        la, ph = anqs.log_psi(params, bitops.pack(jnp.asarray(x)))
        assert la.shape == (10,) and ph.shape == (10,)
        assert np.isfinite(np.asarray(ph)).all()


def test_made_causality():
    """Output at qudit q must not depend on bits at qudits >= q."""
    n = 9
    _, anqs, params = build(n, n_elec=4, twice_sz=0, qpq=3)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, size=(5, n))
    from anqs_quantum_chemistry_tpu.models.made import made_apply

    base = np.asarray(
        made_apply(anqs.main_spec, params["main"], jnp.asarray(x, jnp.float32))
    )
    for q in range(anqs.qudit_num):
        # perturb bits at qudits >= q
        x2 = x.copy()
        start = anqs.qudit_starts[q]
        x2[:, start:] = 1 - x2[:, start:]
        out2 = np.asarray(
            made_apply(
                anqs.main_spec, params["main"], jnp.asarray(x2, jnp.float32)
            )
        )
        np.testing.assert_allclose(
            out2[:, : q + 1], base[:, : q + 1], atol=1e-5,
            err_msg=f"qudit {q} sees its own/future bits",
        )


def test_unphysical_amplitude_is_zero():
    n = 8
    masker, anqs, params = build(n)
    x = all_states(n)
    phys = masker.is_physical(x)
    bad = x[~phys][:16]
    re, im = anqs.amplitude(params, bitops.pack(jnp.asarray(bad)))
    assert np.abs(np.asarray(re)).max() < 1e-20
    assert np.abs(np.asarray(im)).max() < 1e-20


def test_per_layer_patterns():
    """Reference PatternConfig parity: per-layer activation tuples, the
    'sanqs_paper' preset (tanh then leaky_relu), and per-layer bias on/off
    all yield normalized states; disabled biases are absent from params."""
    n = 8
    x = all_states(n)
    words = bitops.pack(jnp.asarray(x))
    for net_type in ("made", "nade"):
        for cfg in (
            dict(activation="sanqs_paper", hidden_widths=(32, 32)),
            dict(activation=("relu", "tanh"), hidden_widths=(32, 32)),
            dict(bias=(True, False, True), hidden_widths=(32, 32)),
        ):
            # Explicit per-layer tuples apply to the aux net too, so its
            # depth must match.
            masker, anqs, params = build(
                n, net_type=net_type, aux_hidden_widths=(32, 32), **cfg
            )
            la, _ = anqs.log_psi(params, words)
            probs = np.exp(2 * np.asarray(la, dtype=np.float64))
            phys = masker.is_physical(x)
            np.testing.assert_allclose(probs[phys].sum(), 1.0, rtol=5e-4)
            if "bias" in cfg:
                leaves = jax.tree_util.tree_leaves_with_path(params)
                names = [jax.tree_util.keystr(p) for p, _ in leaves]
                assert not any("b1" in s for s in names), names
                assert any("b0" in s for s in names)


def test_logit_cap_bounds_contrast():
    """logit_cap soft-caps raw conditionals: normalization still exact,
    and the total log-amplitude contrast is bounded by qudit_num * 2*cap
    (the collapse guard for peaked >50q wavefunctions)."""
    n = 8
    cap = 2.0
    masker, anqs, params = build(n, logit_cap=cap)
    x = all_states(n)
    words = bitops.pack(jnp.asarray(x))
    la, _ = anqs.log_psi(params, words)
    la = np.asarray(la, dtype=np.float64)
    probs = np.exp(2 * la)
    phys = masker.is_physical(x)
    np.testing.assert_allclose(probs[phys].sum(), 1.0, rtol=5e-4)
    contrast = la[phys].max() - la[phys].min()
    # Per qudit the capped conditional spread is <= 2*cap, plus the
    # masked log-softmax normalizer (<= log D per qudit).
    q, d = anqs.qudit_num, anqs.max_dim
    assert contrast <= q * (2 * cap + np.log(d)) + 1e-6
