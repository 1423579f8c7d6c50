"""Cross-experiment harvesting (experiments/processing.py harvest/
aggregate_seeds) over a synthetic run tree -- the counterpart of the
reference's tree-walking result harvester (plotting.py:25-118)."""

import gzip
import json
import os

import numpy as np

from anqs_quantum_chemistry_tpu.experiments.processing import (
    aggregate_seeds,
    harvest,
    load_results,
    time_to_chemical_accuracy,
)


def _make_run(root, name, seed, lr, energies, gz=False):
    d = os.path.join(root, name)
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"seed": seed, "lr": lr, "sample_num": 64}, f)
    lines = ["energy,full_energy,iter_idx,wall_time"]
    for i, e in enumerate(energies):
        fe = e - 1e-4 if i == len(energies) - 1 else float("nan")
        lines.append(f"{e},{fe},{i},{0.1 * (i + 1)}")
    payload = "\n".join(lines) + "\n"
    if gz:
        with gzip.open(os.path.join(d, "result.csv.gz"), "wt") as f:
            f.write(payload)
    else:
        with open(os.path.join(d, "result.csv"), "w") as f:
            f.write(payload)
    return d


def test_harvest_and_seed_aggregation(tmp_path):
    root = str(tmp_path)
    _make_run(root, "a_s0", 0, 1e-3, [-1.0, -1.2, -1.3])
    _make_run(root, "a_s1", 1, 1e-3, [-1.0, -1.25, -1.28], gz=True)
    d = _make_run(root, "b_s0", 0, 3e-3, [-1.0, -1.1, -1.15])
    with open(os.path.join(d, "full_energy_revalidation.json"), "w") as f:
        json.dump({"full_energy_f64": -1.149, "gap_to_fci_mHa": 2.0}, f)

    df = load_results(root)
    assert set(df["run_dir"].unique()) == {
        os.path.join(root, n) for n in ("a_s0", "a_s1", "b_s0")
    }

    summary = harvest(root)
    assert len(summary) == 3
    a0 = summary[summary.run_dir.str.endswith("a_s0")].iloc[0]
    assert a0["best_energy"] == -1.3
    assert a0["cfg.lr"] == 1e-3
    assert np.isclose(a0["final_full_energy"], -1.3001)
    b0 = summary[summary.run_dir.str.endswith("b_s0")].iloc[0]
    assert b0["gap_to_fci_mHa"] == 2.0

    agg = aggregate_seeds(summary)
    assert len(agg) == 2  # two distinct (lr, sample_num) groups
    grp = agg[agg["cfg.lr"] == 1e-3].iloc[0]
    assert grp["n_seeds"] == 2
    assert grp["best_energy"] == -1.3
    assert np.isclose(grp["mean_best_energy"], (-1.3 - 1.28) / 2)

    # time-to-accuracy on one trajectory
    one = df[df.run_dir.str.endswith("a_s0")]
    assert time_to_chemical_accuracy(one, fci_energy=-1.3005) == 0.3
