"""SR linear-algebra accuracy envelope vs an f64 oracle.

Round-2 VERDICT weak #5 / next-round #7: the f32 Jacobi-prescaled LU solve
(optim/sr.py minsr_precondition) is a toolchain workaround (f64 LU / f32
eigh do not compile through the TPU AOT path) and previously had no test
tying it to the reference semantics. Here both branches are property-tested
against float64 numpy oracles across k in {25, 50} and reg_eps in
{1e-2 .. 1e-6}, including near-singular Gram matrices:

* use_reg=True  oracle: grad = eps^-1 [g - O^H (eps I + O O^H)^-1 O g]
  (reference: .../experiments/calculations/sr.py:121-128).
* use_reg=False oracle: grad = O^H pinv(T)^2 O g = (O^H O)^+ g with the
  soft SVD cutoff (reference: sr.py:129-135, utils/misc.py:38-52).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from anqs_quantum_chemistry_tpu.optim.sr import minsr_precondition


def _oracle_reg(o, g, eps):
    k = o.shape[0]
    t = o @ o.conj().T
    y = np.linalg.solve(eps * np.eye(k) + t, o @ g)
    return np.real(g - o.conj().T @ y) / eps


def _oracle_pinv(o, g):
    t = o @ o.conj().T
    u, s, vh = np.linalg.svd(t)
    # Reference soft_eigvals_inv: zero out eigenvalues isclose to 0.
    s_inv = np.where(np.isclose(s, 0.0, atol=1e-8 * max(s.max(), 1e-30)),
                     0.0, 1.0 / np.maximum(s, 1e-300))
    t_pinv = vh.conj().T @ np.diag(s_inv) @ u.conj().T
    return np.real(o.conj().T @ (t_pinv @ (t_pinv @ (o @ g))))


def _make_o(rng, k, p, kind):
    o = rng.standard_normal((k, p)) + 1j * rng.standard_normal((k, p))
    if kind == "near_singular":
        # Duplicate half the rows (rank deficiency) + a tiny perturbation.
        o[k // 2 :] = o[: k - k // 2] * (1 + 1e-6)
    elif kind == "wide_spectrum":
        scale = np.logspace(0, -5, k)[:, None]
        o = o * scale
    return o * 0.3  # typical log-derivative magnitudes


@pytest.mark.parametrize("k", [25, 50])
@pytest.mark.parametrize("eps", [1e-2, 1e-4, 1e-6])
@pytest.mark.parametrize("kind", ["generic", "near_singular",
                                  "wide_spectrum"])
def test_minsr_reg_matches_f64_oracle(k, eps, kind):
    rng = np.random.default_rng(hash((k, kind)) % 2**31)
    p = 200
    o = _make_o(rng, k, p, kind)
    g = rng.standard_normal(p)

    got = np.asarray(
        minsr_precondition(
            jnp.asarray(np.real(o), jnp.float32),
            jnp.asarray(np.imag(o), jnp.float32),
            jnp.asarray(g, jnp.float32),
            eps,
            use_reg=True,
        ),
        np.float64,
    )
    # The implementation clamps eps to a relative floor (2^-20 * max
    # diag T, computed in f32) so the f32 factorization stays well
    # conditioned; the contract is "the reference formula at the
    # effective eps", which this oracle mirrors.
    of32 = o.astype(np.complex64)
    t_diag = np.real(np.diag(of32 @ of32.conj().T)).astype(np.float32)
    eff_eps = max(np.float32(eps), np.float32(2.0**-20) * t_diag.max())
    want = _oracle_reg(o, g, float(eff_eps))
    # Accuracy envelope: f32 O-matrix entries alone bound agreement at
    # ~1e-6 relative; the prescaled+refined solve must not degrade it by
    # more than ~2 orders even on the adversarial spectra.
    denom = np.linalg.norm(want)
    assert np.linalg.norm(got - want) / denom < 5e-4, (
        kind, eps, np.linalg.norm(got - want) / denom
    )


@pytest.mark.parametrize("k", [25, 50])
@pytest.mark.parametrize("kind", ["generic", "near_singular"])
def test_minsr_pinv_matches_svd_oracle(k, kind):
    """use_reg=False == the reference's SVD pseudo-inverse natural
    gradient (O^H O)^+ g (up to the ridge-vs-truncation treatment of the
    near-zero spectrum, which both damp to zero)."""
    rng = np.random.default_rng(k * 7 + 1)
    p = 200
    o = _make_o(rng, k, p, "generic")
    if kind == "near_singular":
        o[k // 2 :] = o[: k - k // 2]  # exactly rank-deficient
    g = rng.standard_normal(p)

    got = np.asarray(
        minsr_precondition(
            jnp.asarray(np.real(o), jnp.float32),
            jnp.asarray(np.imag(o), jnp.float32),
            jnp.asarray(g, jnp.float32),
            0.0,
            use_reg=False,
        ),
        np.float64,
    )
    want = _oracle_pinv(o, g)
    # The ridge floor (2^-20 * max diag) vs the oracle's hard SVD cutoff
    # treat the near-zero spectrum differently BY DESIGN (both damp it
    # to ~zero); the meaningful comparison is on the numerically retained
    # row space of O, where both must agree.
    u, s, vh = np.linalg.svd(o, full_matrices=False)
    keep = s > 1e-4 * s.max()
    proj = vh[keep].conj().T @ vh[keep]
    gp = np.real(proj @ got)
    wp = np.real(proj @ want)
    denom = np.linalg.norm(wp)
    tol = 2e-3 if kind == "generic" else 2e-2
    assert np.linalg.norm(gp - wp) / denom < tol, (
        kind, np.linalg.norm(gp - wp) / denom
    )
    # And the off-rowspace content stays bounded (no blowup from the
    # damped spectrum).
    assert np.linalg.norm(got) < 10 * max(np.linalg.norm(want), 1.0)


def test_minsr_eps_floor_keeps_solve_finite():
    """A pathological Gram matrix (huge dynamic range) with a tiny
    requested eps must not blow up the f32 solve: the relative floor
    keeps the preconditioned gradient finite and bounded."""
    rng = np.random.default_rng(3)
    k, p = 50, 120
    o = rng.standard_normal((k, p)) * np.logspace(4, -8, k)[:, None]
    g = rng.standard_normal(p)
    got = np.asarray(
        minsr_precondition(
            jnp.asarray(o, jnp.float32),
            jnp.zeros((k, p), jnp.float32),
            jnp.asarray(g, jnp.float32),
            1e-12,  # far below the f32 floor
            use_reg=True,
        )
    )
    assert np.isfinite(got).all()
    assert np.linalg.norm(got) < 1e12


def test_schulz_on_captured_li2o_death_state():
    """Regression: the regularized system captured from the Li2O NADE
    run that NaN'd on TPU (cond ~ 2^21 from centered near-dependent
    jacobian rows). The truncated Schulz + Richardson solve must stay
    finite and match the f64 oracle; the 48-iteration and symmetrized
    variants both diverged here."""
    import os

    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.optim.sr import _solve_prescaled

    d = np.load(
        os.path.join(os.path.dirname(__file__), "data",
                     "sr_death_block.npz")
    )
    m = jnp.asarray(d["m"])
    rhs = jnp.asarray(d["rhs"])
    dvec = jnp.asarray(
        1.0 / np.sqrt(np.maximum(np.diag(d["m"]), 1e-30)), jnp.float32
    )
    y = np.asarray(_solve_prescaled(m, dvec, rhs), np.float64)
    assert np.isfinite(y).all()
    rel = np.linalg.norm(y - d["y64"]) / np.linalg.norm(d["y64"])
    assert rel < 1e-2, rel
