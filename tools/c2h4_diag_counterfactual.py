"""C2H4 27-mHa gap attribution: magnitudes vs phases (round-5 triage).

Uses the cached on-support amplitudes of the best checkpoint
(tools/c2h4_diag_fidelity.py) and the exact restricted H to evaluate
counterfactual Rayleigh quotients:

  rq(net)              — as trained (cross-check vs the rql logs)
  rq(|net|, sign(c))   — keep the network's magnitudes, replace phases
                         with the target's exact signs
  rq(|c|, phase(net))  — keep the network's phases, replace magnitudes
                         with the target's
  rq(c)                — the 98.6%-corr restricted optimum

plus fine rank bins of the perp mass split into radial (magnitude) and
tangential (phase) parts. Decides the round-5 C2H4 plan: if the
sign-fix counterfactual recovers most of the gap, the lever is
supervised phase distillation on the known SCI signs; if magnitudes
dominate, it is amplitude-profile optimization/capacity.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import scipy.sparse

RUN_DIR = "runs/c2h4_sci"


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import c2h4_support_ci as ex

    mol = ex.prep_mol()
    hf, ref = mol.hf_energy, mol.ccsd_t_energy

    def corr(e):
        return 100.0 * (e - hf) / (ref - hf)

    d = np.load(ex.TARGET)
    c = np.asarray(d["coef"], np.float64)
    summary = json.load(open(os.path.join(RUN_DIR, "summary.json")))
    ck = summary.get("best_ckpt", os.path.join(RUN_DIR, "ckpt_43"))
    dd = np.load(os.path.join(
        RUN_DIR, f"diag_amps_{os.path.basename(ck)}.npz"
    ))
    la, ph = dd["la"], dd["ph"]
    h = scipy.sparse.load_npz(os.path.join(RUN_DIR, "h_support.npz"))

    def rq(v):
        v = v / np.sqrt(np.sum(np.abs(v) ** 2))
        return float(np.real(np.conj(v) @ (h @ v))) + mol.e_nuc

    psi = np.exp(la + 1j * ph)
    amp = np.abs(psi)

    e_net = rq(psi)
    e_signfix = rq(amp * np.sign(c))
    e_ampfix = rq(np.abs(c) * np.exp(1j * ph))
    e_t = rq(c.astype(np.complex128))
    print(f"rq(net)            = {e_net:.6f} ({corr(e_net):6.2f}%)")
    print(f"rq(|net|, sign(c)) = {e_signfix:.6f} ({corr(e_signfix):6.2f}%)"
          f"   phase-fix recovers {(e_net - e_signfix) * 1e3:+.3f} mHa")
    print(f"rq(|c|, phase(net))= {e_ampfix:.6f} ({corr(e_ampfix):6.2f}%)"
          f"   amp-fix recovers {(e_net - e_ampfix) * 1e3:+.3f} mHa")
    print(f"rq(target)         = {e_t:.6f} ({corr(e_t):6.2f}%)")

    # Perp-mass split by rank bins: radial (magnitude) vs tangential
    # (phase) components relative to the globally-phased target.
    ovl = complex(np.vdot(psi, c))
    m_s = float(np.sum(amp**2))
    psi_rot = psi * np.exp(1j * np.angle(ovl))
    r = psi_rot / np.sqrt(m_s)
    a = abs(ovl) / np.sqrt(m_s)
    order = np.argsort(-np.abs(c))
    bins = [(0, 100), (100, 1000), (1000, 10000), (10000, 100000),
            (100000, len(c))]
    print("\n rank bin: target_mass net_mass perp  perp_radial perp_phase")
    for lo, hi in bins:
        idx = order[lo:hi]
        tm = float(np.sum(c[idx] ** 2))
        nm = float(np.sum(np.abs(r[idx]) ** 2))
        resid = r[idx] - a * c[idx]
        pm = float(np.sum(np.abs(resid) ** 2))
        # radial: same complex direction as c, wrong length.
        sgn = np.sign(c[idx])
        sgn[sgn == 0] = 1.0
        radial = (np.abs(r[idx]) - a * np.abs(c[idx]))
        p_rad = float(np.sum(radial**2))
        p_ph = max(pm - p_rad, 0.0)
        print(f"  [{lo:6d},{hi:6d}): {tm:.3e} {nm:.3e} {pm:.3e}  "
              f"{p_rad:.3e} {p_ph:.3e}")

    out = {
        "ckpt": ck,
        "rq_net": e_net, "rq_signfix": e_signfix,
        "rq_ampfix": e_ampfix, "rq_target": e_t,
        "corr_net": corr(e_net), "corr_signfix": corr(e_signfix),
        "corr_ampfix": corr(e_ampfix),
    }
    with open(os.path.join(RUN_DIR, "diag_counterfactual.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
