"""Experiment-series runner with skip-finished bookkeeping.

Counterpart of the reference sandbox series loop, which tracks
started/finished config sets in pickles so interrupted sweeps resume where
they left off (reference: nqs/nqs/energy_opt_exp_sandbox.py:50-121; also
the resumability-by-cache story of SURVEY.md section 5.3). Here each run
lives in ``<root>/<sha16>/`` with ``config.json`` + ``result.csv`` +
``FINISHED`` marker; re-running the series skips finished entries and
re-runs interrupted ones.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

from ..chem.molecule import Molecule
from ..models.anqs import AnqsConfig
from .vmc import VMC, VMCConfig


def run_series(
    entries: Iterable[Tuple[Molecule, VMCConfig, AnqsConfig]],
    root_dir: str,
    iter_num: Optional[int] = None,
    steps_per_call: int = 1,
    on_result: Optional[Callable] = None,
):
    """Run every (molecule, vmc config, ansatz config) entry, skipping
    entries whose run dir carries a FINISHED marker. Returns the list of
    (run_dir, best) pairs for this invocation (skipped entries included,
    with best read from disk)."""
    import json

    import numpy as np

    os.makedirs(root_dir, exist_ok=True)
    results = []
    for mol, cfg, acfg in entries:
        import dataclasses as _dc
        import hashlib

        sig = json.dumps(
            [cfg.to_dict(), _dc.asdict(acfg), mol.config.to_dict()],
            sort_keys=True,
            default=str,
        )
        run_dir = os.path.join(
            root_dir, hashlib.sha256(sig.encode()).hexdigest()[:16]
        )
        marker = os.path.join(run_dir, "FINISHED")
        best_path = os.path.join(run_dir, "best_energy.npy")
        if os.path.exists(marker):
            e, it = np.load(best_path)
            results.append((run_dir, {"energy": float(e),
                                      "iter": int(it), "skipped": True}))
            continue
        vmc = VMC(mol, cfg, acfg, run_dir=run_dir)
        _, _, _, best = vmc.run(
            iter_num=iter_num, steps_per_call=steps_per_call,
            checkpoint_every=None,
        )
        with open(marker, "w") as f:
            f.write("done\n")
        best = dict(best, skipped=False)
        results.append((run_dir, best))
        if on_result is not None:
            on_result(run_dir, best)
    return results
