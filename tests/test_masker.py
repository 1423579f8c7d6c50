import itertools

import numpy as np

from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
    z2_symmetry,
    idle_symmetry,
)


def all_bits(n):
    return np.array(list(itertools.product([0, 1], repeat=n)), dtype=np.int64)[
        :, ::-1
    ].copy()  # qubit 0 = LSB ordering; irrelevant for exhaustive checks


def brute_force_extendable(masker, prefix_bits):
    """Oracle: does any suffix make the full state physical?"""
    n = masker.qubit_num
    m = prefix_bits.shape[-1]
    if m == n:
        return masker.is_physical(prefix_bits)
    suffixes = all_bits(n - m)
    full = np.concatenate(
        [
            np.broadcast_to(prefix_bits[None, :], (len(suffixes), m)),
            suffixes,
        ],
        axis=1,
    )
    return masker.is_physical(full).any()


def check_memo_against_brute_force(masker):
    n = masker.qubit_num
    for m in range(n + 1):
        prefixes = all_bits(m) if m else np.zeros((1, 0), dtype=np.int64)
        got = masker.prefix_extendable(prefixes)
        expected = np.array(
            [brute_force_extendable(masker, p) for p in prefixes]
        )
        np.testing.assert_array_equal(got, expected, err_msg=f"prefix len {m}")


def test_particle_number_memo():
    n = 8
    masker = Masker([particle_number_symmetry(n, 3)])
    check_memo_against_brute_force(masker)
    full = all_bits(n)
    np.testing.assert_array_equal(masker.is_physical(full), full.sum(1) == 3)


def test_pn_spin_memo():
    n = 8
    masker = Masker(
        [particle_number_symmetry(n, 4), spin_projection_symmetry(n, 0)]
    )
    check_memo_against_brute_force(masker)
    full = all_bits(n)
    expected = (full.sum(1) == 4) & (
        full[:, 0::2].sum(1) == full[:, 1::2].sum(1)
    )
    np.testing.assert_array_equal(masker.is_physical(full), expected)


def test_z2_memo():
    n = 6
    rng = np.random.default_rng(0)
    z_mask = np.array([1, 0, 1, 1, 0, 1])
    masker = Masker(
        [
            particle_number_symmetry(n, 2),
            z2_symmetry(z_mask, -1),
        ]
    )
    check_memo_against_brute_force(masker)
    full = all_bits(n)
    expected = (full.sum(1) == 2) & (
        (-1) ** (full * z_mask).sum(1) == -1
    )
    np.testing.assert_array_equal(masker.is_physical(full), expected)


def test_idle_memo():
    masker = Masker([idle_symmetry(5)])
    assert masker.memo.all()


def test_grouping_tables_match_masker():
    n = 10
    masker = Masker(
        [particle_number_symmetry(n, 4), spin_projection_symmetry(n, 2)]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    assert grouping.qudit_num == 4
    assert grouping.qudit_widths == (3, 3, 3, 1)

    # Walk every physical state through the qudit tables: every step must be
    # allowed and end with a memo index whose final entry is physical.
    full = all_bits(n)
    phys = full[masker.is_physical(full)]
    assert len(phys) > 0
    for state in phys:
        idx = grouping.start_memo_idx
        for q, (s, e) in enumerate(
            zip(grouping.qudit_starts, grouping.qudit_ends)
        ):
            cont = int(sum(state[s + j] << j for j in range(e - s)))
            assert grouping.mask_tables[q, idx, cont], (q, idx, cont)
            idx = grouping.trans_tables[q, idx, cont]
        assert masker.memo[n, idx]

    # Conversely, any full path the tables allow must be a physical state.
    def walk(q, idx, prefix):
        if q == grouping.qudit_num:
            bits = np.array(prefix, dtype=np.int64)
            assert masker.is_physical(bits)
            return 1
        count = 0
        s, e = grouping.qudit_starts[q], grouping.qudit_ends[q]
        for cont in range(2 ** (e - s)):
            if grouping.mask_tables[q, idx, cont]:
                ext = [(cont >> j) & 1 for j in range(e - s)]
                count += walk(
                    q + 1, grouping.trans_tables[q, idx, cont], prefix + ext
                )
        return count

    assert walk(0, grouping.start_memo_idx, []) == len(phys)
