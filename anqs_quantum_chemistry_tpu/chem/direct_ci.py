"""String-based direct CI ("sigma build") on TPU: FCI far beyond eigsh.

The brute-force FCI in chem/fci.py stores a sparse Hamiltonian and is
capped at 20 qubits (MAX_BF_FCI_QUBITS, like the reference's run_bf_fci --
reference: nqs/nqs/applications/quantum_chemistry/molecular_data.py:83-89).
The reference gets bigger FCI anchors from PySCF's C direct-CI solver
(reference: run_pyscf.py:266-276); this module is the standalone,
TPU-native equivalent: the Knowles-Handy/Olsen string factorization turns
H|c> into row gathers + one MXU matmul per block, so a Davidson solve over
Li2O/STO-3G's 41.4M-determinant sector runs in minutes on one chip.

Factorization (spatial orbitals, real integrals; E_kl = sum_s a+_ks a_ls):

    H = H_aa (x) I  +  I (x) H_bb  +  sum_{kl,mn} (kl|mn) E^a_kl E^b_mn

* H_aa / H_bb: the one-spin Hamiltonians (one-electron + same-spin
  two-electron incl. exchange) -- dense (S, S) string matrices built once
  on the host with the verified Slater-Condon code; their application is
  a plain MXU matmul.
* The mixed term: E^a_kl (k != l) is a PARTIAL SIGNED PERMUTATION of
  alpha strings (at most one source per row), so applying it is a signed
  row gather; E_kk is a diagonal occupancy weight.  The (kl|mn) contraction
  over the n^2-sized pair index is one (P, P) x (P, block) matmul.

Per beta-row block (B columns of sigma3):
  1. N[mn, Ib, :] = w_b[mn, Ib] * C^T[src_b[mn, Ib], :]     (row gather)
  2. M[kl]        = sum_mn g2[kl, mn] N[mn]                 (MXU matmul)
  3. sigma3[Ia, Ib] = sum_kl w_a[kl, Ia] * M[kl, Ib, src_a[kl, Ia]]
     (transpose + 512-lane row gather + weighted reduction)

Everything is padded to block multiples with zero weights; all tables are
threaded as jit arguments (never baked constants -- see CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------


def spatial_from_spin_orbital(
    h1: np.ndarray, v: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Recover spatial MO integrals from the interleaved spin-orbital pair.

    ``h1``/``v`` are the arrays Molecule stores (even bits alpha,
    ``v[p,q,r,s] = <pq|rs>`` physicist).  Returns ``(h_mo, g2)`` with
    ``g2[k,l,m,n] = (kl|mn)`` chemist notation, taken from the
    alpha-beta block (spatial integrals are spin-independent).
    """
    n = h1.shape[0] // 2
    a = 2 * np.arange(n)
    h_mo = h1[np.ix_(a, a)]
    # (kl|mn) = <k_a m_b | l_a n_b>  ->  v[2k, 2m+1, 2l, 2n+1]
    g2 = v[np.ix_(a, a + 1, a, a + 1)].transpose(0, 2, 1, 3)
    return np.ascontiguousarray(h_mo), np.ascontiguousarray(g2)


def ci_strings(n_orb: int, n_elec: int) -> np.ndarray:
    """All C(n_orb, n_elec) occupation bitmasks, ascending (HF first)."""
    import itertools

    out = sorted(
        sum(1 << o for o in occ)
        for occ in itertools.combinations(range(n_orb), n_elec)
    )
    return np.asarray(out, np.int64)


def excitation_tables(
    strs: np.ndarray, n_orb: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pair signed string maps for E_kl applied to this string set.

    Returns ``(src, w)`` of shape (n_orb^2, S):
      row I of E_kl c  =  w[k*n+l, I] * c[src[k*n+l, I]].
    For k == l the map is the identity weighted by occupancy n_k; for
    k != l row I is active iff k in I, l not in I, with
    src = I - k + l and the fermionic parity of a+_k a_l |src>.
    """
    S = len(strs)
    occ = ((strs[:, None] >> np.arange(n_orb)[None, :]) & 1).astype(
        np.int32
    )  # (S, n_orb)
    cum = np.cumsum(occ, axis=1)  # cum[:, p] = n occupied <= p

    def below(rows: np.ndarray, p: int) -> np.ndarray:
        return cum[rows, p - 1] if p > 0 else np.zeros(len(rows), np.int32)

    src = np.tile(np.arange(S, dtype=np.int32), (n_orb * n_orb, 1))
    w = np.zeros((n_orb * n_orb, S), np.float32)
    for k in range(n_orb):
        for l in range(n_orb):
            kl = k * n_orb + l
            if k == l:
                w[kl] = occ[:, k]
                continue
            valid = (occ[:, k] == 1) & (occ[:, l] == 0)
            rows = np.nonzero(valid)[0]
            if len(rows) == 0:
                continue
            j_str = strs[rows] - (1 << k) + (1 << l)
            j_idx = np.searchsorted(strs, j_str).astype(np.int32)
            # parity of a+_k a_l |J>: count below l in J, then below k
            # in J - l (= count below k in J, minus one if l < k).
            par = below(j_idx, l) + below(j_idx, k) - (1 if l < k else 0)
            src[kl, rows] = j_idx
            w[kl, rows] = np.where(par % 2 == 0, 1.0, -1.0)
    return src, w


def same_spin_dense(
    strs: np.ndarray, h1: np.ndarray, v: np.ndarray
) -> np.ndarray:
    """Dense one-spin string Hamiltonian (one-electron + same-spin 2e).

    Encodes strings on the alpha (even) bits and reuses the verified
    spin-orbital Slater-Condon builder (chem/fci.py / the C++ native
    path), which restricted to one spin is exactly H_ss.
    """
    from .fci import sparse_hamiltonian

    n_orb = h1.shape[0] // 2
    dets = np.zeros(len(strs), np.int64)
    for k in range(n_orb):
        dets += ((strs >> k) & 1) << (2 * k)
    h_sp = sparse_hamiltonian([int(d) for d in dets], h1, v)
    return np.asarray(h_sp.todense(), np.float32)


def _occupancy(strs: np.ndarray, n_orb: int) -> np.ndarray:
    return (
        (strs[:, None] >> np.arange(n_orb)[None, :]) & 1
    ).astype(np.float32)


def interleave_parity(
    str_a: np.ndarray, str_b: np.ndarray, n_orb: int
) -> np.ndarray:
    """(S_a, S_b) grid of +-1 relating the two determinant conventions.

    The string basis is alpha creation operators first, then beta; the
    interleaved spin-orbital basis (chem/fci.py, the JW/ANQS side)
    applies creators in ascending spin-orbital order.  Reordering moves
    each beta creator m past every alpha creator k > m, so
    parity(Ia, Ib) = (-1)^(sum_{m in Ib} #{k in Ia : k > m}).
    Amplitudes map as  c_interleaved = parity * c_string.
    """
    occ_a = _occupancy(str_a, n_orb)  # (S_a, n)
    occ_b = _occupancy(str_b, n_orb)
    # above[k_cut] = number of alpha orbitals with index > k_cut
    above_a = (
        occ_a.sum(axis=1, keepdims=True)
        - np.cumsum(occ_a, axis=1)
    )  # (S_a, n): entries above orbital m
    crossings = above_a @ occ_b.T  # (S_a, S_b)
    return np.where(crossings.astype(np.int64) % 2 == 0, 1.0, -1.0).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Device sigma build
# ---------------------------------------------------------------------------


def _pad_tables(src, w, s_pad):
    p, s = src.shape
    src_p = np.zeros((p, s_pad), np.int32)
    w_p = np.zeros((p, s_pad), np.float32)
    src_p[:, :s] = src
    w_p[:, :s] = w
    return src_p, w_p


def make_sigma(
    n_orb: int,
    s_alpha: int,
    s_beta: int,
    block: int = 256,
    dtype=None,
):
    """Build the jittable sigma(c, tables...) closure.

    All operands arrive as arguments so nothing is baked into the
    executable as a constant.  ``dtype`` defaults to f32; pass
    jnp.float64 for the final high-precision Rayleigh-quotient pass.
    """
    import jax
    import jax.numpy as jnp

    dt = dtype or jnp.float32
    hi = jax.lax.Precision.HIGHEST

    b = min(block, max(128, s_beta))
    sa_pad = -(-s_alpha // 128) * 128
    sb_pad = -(-s_beta // b) * b
    n_blocks = sb_pad // b

    def sigma(c, h_a, h_b, g2p, src_a, w_a, src_b, w_b, shift):
        """sigma = (H - shift) c over the padded (sa_pad, sb_pad) grid."""
        c = c.astype(dt)
        s1 = jnp.matmul(h_a, c, precision=hi)
        s2 = jnp.matmul(c, h_b.T, precision=hi)
        ct = c.T  # (sb_pad, sa_pad)

        def body(ib, s3):
            cols = ib * b
            src_blk = jax.lax.dynamic_slice(
                src_b, (0, cols), (src_b.shape[0], b)
            )  # (P, b)
            w_blk = jax.lax.dynamic_slice(
                w_b, (0, cols), (w_b.shape[0], b)
            )
            # 1. row-gather C^T by the beta maps: N[mn, r, Ja]
            n_blk = jnp.take(ct, src_blk, axis=0) * w_blk[:, :, None]
            # 2. integral contraction over the pair index (MXU)
            p = g2p.shape[0]
            m_blk = jnp.matmul(
                g2p, n_blk.reshape(p, -1), precision=hi
            ).reshape(p, b, sa_pad)
            # 3. apply the alpha maps: transpose so the gathered rows are
            # (b,)-wide contiguous lanes, gather, weight, reduce over kl.
            m_t = m_blk.transpose(0, 2, 1)  # (P, sa_pad, b)
            picked = jnp.take_along_axis(
                m_t, src_a[:, :, None], axis=1
            )  # (P, sa_pad, b)
            s3_blk = jnp.einsum(
                "ps,psb->sb", w_a, picked, precision=hi
            )
            return jax.lax.dynamic_update_slice(s3, s3_blk, (0, cols))

        s3 = jax.lax.fori_loop(
            0, n_blocks, body, jnp.zeros((sa_pad, sb_pad), dt)
        )
        return s1 + s2 + s3 - shift * c

    return sigma, sa_pad, sb_pad


def host_sigma_f64(
    c: np.ndarray,
    h_a: np.ndarray,
    h_b: np.ndarray,
    g2p: np.ndarray,
    src_a: np.ndarray,
    w_a: np.ndarray,
    src_b: np.ndarray,
    w_b: np.ndarray,
    block: int = 64,
) -> np.ndarray:
    """Numpy f64 mirror of the device sigma (H c, no shift).

    The TPU AOT toolchain refuses to compile the f64 variant of the
    device sigma at Li2O scale (tpu_compile_helper exit 1), so the final
    high-precision Rayleigh quotient falls back to this blocked host
    evaluation (~minutes, once per solve).  All operands f64, unpadded
    or padded alike.
    """
    c = np.asarray(c, np.float64)
    s1 = np.asarray(h_a, np.float64) @ c
    s2 = c @ np.asarray(h_b, np.float64).T
    g2p = np.asarray(g2p, np.float64)
    w_a64 = np.asarray(w_a, np.float64)
    w_b64 = np.asarray(w_b, np.float64)
    s3 = np.zeros_like(c)
    ct = np.ascontiguousarray(c.T)  # (sb, sa)
    p_num = g2p.shape[0]
    sb = c.shape[1]
    for cols in range(0, sb, block):
        b = min(block, sb - cols)
        src_blk = src_b[:, cols:cols + b]  # (P, b)
        w_blk = w_b64[:, cols:cols + b]
        n_blk = ct[src_blk] * w_blk[:, :, None]  # (P, b, sa)
        m_blk = (g2p @ n_blk.reshape(p_num, -1)).reshape(
            p_num, b, -1
        )
        m_t = m_blk.transpose(0, 2, 1)  # (P, sa, b)
        picked = np.take_along_axis(m_t, src_a[:, :, None], axis=1)
        s3[:, cols:cols + b] = np.einsum("ps,psb->sb", w_a64, picked)
    return s1 + s2 + s3


# ---------------------------------------------------------------------------
# Davidson
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DirectCIResult:
    energy: float  # total (incl. e_nuc), f64 Rayleigh quotient
    energy_f32: float  # last f32 Davidson Ritz value (+ e_nuc)
    residual: float
    iterations: int
    ipr: float
    coeffs: Optional[np.ndarray]  # (S_a, S_b) f32 (unpadded) if requested


def direct_ci_ground_state(
    h1: np.ndarray,
    v: np.ndarray,
    n_alpha: int,
    n_beta: int,
    e_nuc: float = 0.0,
    hf_electronic: Optional[float] = None,
    block: int = 256,
    tol: float = 3e-4,
    max_iters: int = 120,
    max_subspace: int = 24,
    return_coeffs: bool = False,
    verbose: Callable[[str], None] = lambda s: None,
    final_f64: bool = True,
) -> DirectCIResult:
    """Ground state of the (n_alpha, n_beta) sector by direct CI.

    Runs Davidson with f32 device matvecs on H - shift (shift = the
    electronic HF energy, so sigma elements live on the correlation
    scale, not the total-energy scale), then evaluates one f64
    Rayleigh quotient for the reported energy (second-order accurate
    in the remaining eigenvector error).
    """
    import jax
    import jax.numpy as jnp

    n_orb = h1.shape[0] // 2
    str_a = ci_strings(n_orb, n_alpha)
    str_b = (
        str_a if n_beta == n_alpha else ci_strings(n_orb, n_beta)
    )
    s_a, s_b = len(str_a), len(str_b)

    _, g2 = spatial_from_spin_orbital(h1, v)
    g2p = g2.reshape(n_orb * n_orb, n_orb * n_orb).astype(np.float32)

    h_a = same_spin_dense(str_a, h1, v)
    h_b = h_a if str_b is str_a else same_spin_dense(str_b, h1, v)
    src_a, w_a = excitation_tables(str_a, n_orb)
    src_b, w_b = (
        (src_a, w_a)
        if str_b is str_a
        else excitation_tables(str_b, n_orb)
    )

    sigma, sa_pad, sb_pad = make_sigma(n_orb, s_a, s_b, block=block)
    sigma64, _, _ = make_sigma(
        n_orb, s_a, s_b, block=block, dtype=jnp.float64
    )

    # Shift: electronic HF energy (diagonal element of the HF det).
    occ_a = _occupancy(str_a, n_orb)
    occ_b = _occupancy(str_b, n_orb)
    jmat = np.einsum("kkmm->km", g2)  # (kk|mm)
    diag_np = (
        np.diag(h_a)[:, None]
        + np.diag(h_b)[None, :]
        + occ_a @ jmat @ occ_b.T
    ).astype(np.float32)
    if hf_electronic is None:
        hf_electronic = float(diag_np[0, 0])
    shift = np.float32(hf_electronic)

    def pad(x, rows, cols):
        out = np.zeros((rows, cols), x.dtype)
        out[: x.shape[0], : x.shape[1]] = x
        return out

    dev = {
        "h_a": jnp.asarray(pad(h_a, sa_pad, sa_pad)),
        "h_b": jnp.asarray(pad(h_b, sb_pad, sb_pad)),
        "g2p": jnp.asarray(g2p),
        "src_a": jnp.asarray(_pad_tables(src_a, w_a, sa_pad)[0]),
        "w_a": jnp.asarray(_pad_tables(src_a, w_a, sa_pad)[1]),
        "src_b": jnp.asarray(_pad_tables(src_b, w_b, sb_pad)[0]),
        "w_b": jnp.asarray(_pad_tables(src_b, w_b, sb_pad)[1]),
    }
    diag_dev = jnp.asarray(
        pad(diag_np - hf_electronic, sa_pad, sb_pad)
    )
    # Padding rows/cols: park the preconditioner far from the spectrum.
    if sa_pad > s_a or sb_pad > s_b:
        mask = np.zeros((sa_pad, sb_pad), bool)
        mask[:s_a, :s_b] = True
        diag_dev = jnp.where(jnp.asarray(mask), diag_dev, 1e6)

    # Tables ride as jit ARGUMENTS, not closure constants: baked-in
    # constants inline the ~170 MB padded same-spin matrices into the
    # HLO, which the axon remote-compile helper rejects outright
    # (HTTP 413) -- same policy as the VMC engine's threaded tables.
    sigma_jit = jax.jit(sigma)

    def mv(c):
        return sigma_jit(
            c,
            dev["h_a"],
            dev["h_b"],
            dev["g2p"],
            dev["src_a"],
            dev["w_a"],
            dev["src_b"],
            dev["w_b"],
            jnp.float32(shift),
        )

    def dot(x, y) -> float:
        return float(
            jnp.vdot(
                x.astype(jnp.float64).ravel(),
                y.astype(jnp.float64).ravel(),
            )
        )

    # Davidson with thick restarts.
    v0 = jnp.zeros((sa_pad, sb_pad), jnp.float32)
    v0 = v0.at[0, 0].set(1.0)
    basis = [v0]
    h_basis = [mv(v0)]
    theta_old = np.inf
    theta = float(dot(basis[0], h_basis[0]))
    ritz = v0
    res_norm = np.inf
    it = 0
    for it in range(1, max_iters + 1):
        m = len(basis)
        hm = np.zeros((m, m), np.float64)
        for i in range(m):
            for j in range(i, m):
                hm[i, j] = hm[j, i] = dot(basis[i], h_basis[j])
        evals, evecs = np.linalg.eigh(hm)
        theta, y = float(evals[0]), evecs[:, 0]
        ritz = sum(float(y[i]) * basis[i] for i in range(m))
        h_ritz = sum(float(y[i]) * h_basis[i] for i in range(m))
        r = h_ritz - theta * ritz
        res_norm = float(np.sqrt(max(dot(r, r), 0.0)))
        verbose(
            f"davidson it {it:3d} m {m:2d} "
            f"E {theta + hf_electronic + e_nuc:+.8f} "
            f"res {res_norm:.2e}"
        )
        if res_norm < tol and abs(theta - theta_old) < 1e-7:
            break
        theta_old = theta
        # Preconditioned correction, orthogonalized (2x MGS).
        t = r / (diag_dev - np.float32(theta) + 1e-6)
        if m + 1 > max_subspace:
            basis, h_basis = [ritz], [h_ritz]
            nrm = np.sqrt(dot(ritz, ritz))
            basis[0] = basis[0] / np.float32(nrm)
            h_basis[0] = h_basis[0] / np.float32(nrm)
        for _ in range(2):
            for bvec in basis:
                t = t - np.float32(dot(bvec, t)) * bvec
        t_norm = np.sqrt(max(dot(t, t), 0.0))
        if t_norm < 1e-12:
            break
        t = t / np.float32(t_norm)
        basis.append(t)
        h_basis.append(mv(t))

    nrm = np.sqrt(dot(ritz, ritz))
    ritz = ritz / np.float32(nrm)

    energy_f32 = theta + hf_electronic + e_nuc
    energy = energy_f32
    if final_f64:
        def rq_device():
            sigma64_jit = jax.jit(sigma64)
            c64 = ritz.astype(jnp.float64)
            hc = sigma64_jit(
                c64,
                dev["h_a"].astype(jnp.float64),
                dev["h_b"].astype(jnp.float64),
                dev["g2p"].astype(jnp.float64),
                dev["src_a"],
                dev["w_a"].astype(jnp.float64),
                dev["src_b"],
                dev["w_b"].astype(jnp.float64),
                jnp.float64(0.0),
            )
            return dot(c64, hc), dot(c64, c64)

        def rq_host():
            c64 = np.asarray(ritz, np.float64)
            hc = host_sigma_f64(
                c64,
                np.asarray(dev["h_a"]),
                np.asarray(dev["h_b"]),
                g2p,
                np.asarray(dev["src_a"]),
                np.asarray(dev["w_a"]),
                np.asarray(dev["src_b"]),
                np.asarray(dev["w_b"]),
            )
            return float(np.vdot(c64, hc)), float(np.vdot(c64, c64))

        try:
            num, den = rq_device()
        except Exception as exc:  # TPU AOT cannot compile f64 sigma
            verbose(f"f64 device RQ unavailable ({exc!r}); host fallback")
            num, den = rq_host()
        energy = num / den + e_nuc
    ipr_val = float(jnp.sum(ritz.astype(jnp.float64) ** 4))
    coeffs = None
    if return_coeffs:
        coeffs = np.asarray(ritz, np.float32)[:s_a, :s_b]
    return DirectCIResult(
        energy=float(energy),
        energy_f32=float(energy_f32),
        residual=res_norm,
        iterations=it,
        ipr=ipr_val,
        coeffs=coeffs,
    )
