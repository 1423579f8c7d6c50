"""Where do the missing 27.5 mHa of C2H4 live? (round-5 triage)

The rql optimizer is saturated at rq = -78.18851 (85.84% corr) while the
262k-det support's OWN restricted ground state sits at -78.215947
(98.6% corr): a 27.5 mHa on-support gap that support enrichment cannot
touch. This script decomposes the gap for the best measured checkpoint:

  psi_net|_S = a * c_target + b * c_perp,   eps = |b|^2 / m_S

  rq_net - E0 ~= eps * (E_perp - E0): if eps ~ 0.9% spread over the
  target's amplitude tail, the MADE-2048/qpq=4 ansatz cannot SHAPE the
  tail (capacity, like N2's qpq=5 21-mHa plateau) and the fix is a
  higher-capacity ansatz; if the error is concentrated in few dets or
  in phases, it is an optimization artifact and more/better rq applies.

Outputs per-|c|-decile log-amplitude bias/spread + sign agreement, the
exact restricted rq (f64, h_support.npz) and the fidelity. CPU-only
(env-cleaned), runs alongside TPU legs.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import jax
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.optim.pretrain import pack_dets

RUN_DIR = "runs/c2h4_sci"


def main():
    assert jax.devices()[0].platform == "cpu", (
        "run env-cleaned: env -u PALLAS_AXON_POOL_IPS "
        "-u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu python ..."
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import c2h4_support_ci as ex

    mol = ex.prep_mol()
    hf, ref = mol.hf_energy, mol.ccsd_t_energy

    def corr(e):
        return 100.0 * (e - hf) / (ref - hf)

    d = np.load(ex.TARGET)
    dets = np.asarray(d["dets"], np.uint64)
    c = np.asarray(d["coef"], np.float64)
    e0 = float(d["e0"])
    print(f"target: |S|={len(dets)} E0={e0:.6f} ({corr(e0):.2f}%)",
          flush=True)

    summary = json.load(open(os.path.join(RUN_DIR, "summary.json")))
    ck = summary.get("best_ckpt")
    if not ck:
        rows = sorted(summary["stages"], key=lambda s: s["full_e"])
        for r in rows:
            p = os.path.join(RUN_DIR, f"ckpt_{r['stage']}")
            if os.path.isdir(p):
                ck = p
                break
    vmc = ex.make_vmc(mol, precision="highest")
    params, _, _, stage = vmc.load_checkpoint(ck)
    print(f"params from {ck} (stage {stage})", flush=True)

    n = len(dets)
    amp_cache = os.path.join(RUN_DIR, f"diag_amps_{os.path.basename(ck)}.npz")
    if os.path.exists(amp_cache):
        dd = np.load(amp_cache)
        la, ph = dd["la"], dd["ph"]
        print(f"amps from cache {amp_cache}", flush=True)
    else:
        words = pack_dets([int(x) for x in dets], mol.qubit_num)
        chunk = 4096
        pad = (-n) % chunk
        wc = jnp.pad(words, ((0, pad), (0, 0))).reshape(
            (-1, chunk, words.shape[1])
        )

        @jax.jit
        def amps(prm, w):
            la, ph = vmc.anqs.log_psi(prm, w)
            return la, ph

        t0 = time.perf_counter()
        las, phs = [], []
        for i in range(wc.shape[0]):
            la, ph = amps(params, wc[i])
            las.append(np.asarray(la, np.float64))
            phs.append(np.asarray(ph, np.float64))
            if i % 16 == 0:
                print(f"  chunk {i}/{wc.shape[0]} "
                      f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        la = np.concatenate(las)[:n]
        ph = np.concatenate(phs)[:n]
        np.savez_compressed(amp_cache, la=la, ph=ph)

    # COMPLEX network amplitudes on the support: the phase head carries
    # an arbitrary global phase (first version of this diagnostic
    # projected onto the real part and produced garbage -- sign_err 0.5,
    # rq -48 Ha -- because the state sits at global phase ~1 rad; every
    # physical quantity below is global-phase invariant).
    psi = np.exp(la + 1j * ph)
    m_s = float(np.sum(np.abs(psi) ** 2))
    ovl = complex(np.vdot(psi, c))  # c is real, normalized
    fid = abs(ovl) ** 2 / m_s
    eps = 1.0 - fid
    gphase = np.angle(ovl)
    print(f"\non-support mass m_S = {m_s:.6f}")
    print(f"fidelity |<psi|c>|^2 / m_S = {fid:.6f}  (perp eps = {eps:.3e})")
    print(f"global phase = {gphase:+.4f} rad")

    # Exact restricted rq in f64 (complex, phase-invariant).
    import scipy.sparse

    h = scipy.sparse.load_npz(os.path.join(RUN_DIR, "h_support.npz"))
    v = psi / np.sqrt(m_s)
    rq = float(np.real(np.conj(v) @ (h @ v))) + mol.e_nuc
    print(f"restricted rq = {rq:.6f} ({corr(rq):.2f}%)  "
          f"gap to E0 = {(rq - e0) * 1e3:.3f} mHa")
    # Energy of the perp component: rq = fid*E0' + eps*E_perp where
    # E0' = c^T H c + e_nuc (target is ~the restricted GS).
    e_t = float(c @ (h @ c)) + mol.e_nuc
    if eps > 1e-12:
        e_perp = (rq - fid * e_t) / eps
        print(f"target rq = {e_t:.6f}; implied E_perp = {e_perp:.3f} "
              f"({(e_perp - e_t):+.3f} Ha above target)")

    # Decile breakdown: where is the perp mass? Rotate the global phase
    # out first so per-det phase errors are relative to the state's own
    # frame: ovl = <psi|c>, so psi ~ e^{-i*angle(ovl)} c and the
    # de-rotation multiplies by e^{+i*gphase}.
    psi_rot = psi * np.exp(1j * gphase)
    order = np.argsort(-np.abs(c))
    r = psi_rot / np.sqrt(m_s)
    resid = r - (abs(ovl) / np.sqrt(m_s)) * c  # perp component
    print("\n per-decile (by |c| rank): target_mass net_mass perp_mass "
          "log-amp bias+/-spread  phase_err(rad)")
    n_dec = 10
    for dec in range(n_dec):
        lo = dec * n / n_dec
        idx = order[int(lo):int(lo + n / n_dec)]
        tm = float(np.sum(c[idx] ** 2))
        nm = float(np.sum(np.abs(r[idx]) ** 2))
        pm = float(np.sum(np.abs(resid[idx]) ** 2))
        nz = idx[np.abs(c[idx]) > 0]
        dla = (la[nz] - 0.5 * np.log(m_s)) - np.log(
            np.abs(c[nz]) + 1e-300
        )
        # Phase error vs the target's sign, mod global phase.
        dph = np.angle(psi_rot[nz] / np.abs(psi_rot[nz])
                       * np.sign(c[nz]))
        print(f"  dec {dec}: {tm:.3e} {nm:.3e} {pm:.3e}   "
              f"{np.mean(dla):+.3f}+/-{np.std(dla):.3f}   "
              f"{float(np.sqrt(np.mean(dph**2))):.4f}")

    out = {
        "ckpt": ck, "fidelity": fid, "eps_perp": eps, "m_s": m_s,
        "rq_f64": rq, "rq_corr_pct": corr(rq), "e_target": e_t,
        "gap_to_e0_mha": (rq - e0) * 1e3,
    }
    with open(os.path.join(RUN_DIR, "diag_fidelity.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
