"""MXU-native local-energy engine for grouped Pauli Hamiltonians.

Replaces the reference's CUDA-popcount + CSR-expand + scatter_add pipeline
(reference: nqs/nqs/stochastic/observables/pauli_observable.py:240-487) with a
dense formulation built around one insight:

    sign(x, term) = (-1)^popcount(x & B_t) = (-1)^<bits(x), bits(B_t)>

so the whole (batch x term) sign matrix is a binary matmul on the MXU:
``P = bits(X) @ bits(B)^T; sign = 1 - 2*(P mod 2)``, and per-group matrix
elements are one more matmul against the weight-folded group one-hot
``G[t, m] = w_t * [group(t) == m]``:

    ME = sign @ G            # (B, M) all <x^A_m|H|x> elements at once

No scatters, no pointer chasing, no popcount kernels -- the two matmuls are
exact (0/1 values, f32 accumulation, counts <= qubit_num << 2^24).

Coupling discovery against the sampled set ("sample-aware" variational proxy,
reference compute_var_local_energy_proxy, pauli_observable.py:396-487) is a
sorted-membership lookup: x' = x XOR A_m for all (B, M) pairs, found via
branchless binary search in the canonically sorted sample table. This
sorted-join replaces all four reference coupling algorithms (ham /
all_to_all / hamming_ball / trie) -- it computes the identical pair set with
TPU-friendly static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.jw import PauliHamiltonian
from ..ops import bits as bitops
from ..ops import keys


class LocalEnergies(NamedTuple):
    e_re: jnp.ndarray  # (B,) E_loc(x) (ratio form, clipped; diagnostics)
    e_im: jnp.ndarray  # (B,)
    found_pairs: jnp.ndarray  # () int32: connected determinants found
    # Overflow-free numerators t_x = |psi(x)| * E_loc(x) (exact: every term
    # is me * exp(la_x or la_p) with la <= 0, so no exp ratio ever blows
    # up). Born-weighted estimators should use these: mean = sum(a t) /
    # sum(a^2), var = sum(|t|^2)/sum(a^2) - |mean|^2 with a = exp(la).
    t_re: jnp.ndarray = jnp.float32(0)
    t_im: jnp.ndarray = jnp.float32(0)
    # keys dropped by hash-bucket overflow (0 for table/search membership;
    # expected 0 for hash at the dimensioned load factor -- logged so any
    # bias is visible)
    table_overflow: jnp.ndarray = jnp.int32(0)
    # rows whose connected-pair count exceeded the prefilter row capacity
    # AND did not fit the dense-row fallback buffer (their E_loc is
    # truncated; 0 means the prefilter result is exact)
    pf_dropped_rows: jnp.ndarray = jnp.int32(0)


class PauliEngine:
    """Device-resident Hamiltonian structure + local-energy kernels."""

    # Direct-address membership tables are used up to this qubit count
    # (2^22 * 4 B * 2 tables = 32 MB of HBM scratch per step).
    MAX_TABLE_QUBITS = 22

    def __init__(
        self,
        ham: PauliHamiltonian,
        sign_dtype: str = "bfloat16",
        me_chunk: Optional[int] = None,
        # 'auto' | 'split' | 'highest' | 'fast' | 'pallas' | 'grouped'.
        # The exact options cost ~5-6 ms at 16384x2951x536 on v5e (HIGHEST
        # measured ~20% faster than the 3-pass bf16 split, but its f32
        # reductions are chunk-order-sensitive; split is bit-stable, so it
        # is the default at moderate sizes). 'grouped' avoids the dense
        # (T, M) weight-folded one-hot entirely (13 GB for C2H4/6-31G at
        # T=104278, M=20776): groups are padded into power-of-two size
        # classes and reduced class-by-class from the sign matrix --
        # O(B*T) work, no T x M memory. 'auto' picks 'grouped' when the
        # dense operand would exceed ~0.5 GB, else 'split'.
        weights_matmul: str = "auto",
        # 'auto' | 'table' | 'hash' | 'search' | 'prefilter'.
        # 'prefilter' is the cheap-first path for large-M molecules: a
        # 32-bit key-FINGERPRINT pass (one 32-lane row gather + one lane
        # compare per query, ~2.5x cheaper than the full 128-lane bucket
        # lookup) decides candidacy with no false negatives and ~1e-8
        # false positives; survivors are compacted per row by top_k and
        # verified exactly against the full bucket table. This is the TPU
        # re-design of the reference's output-sensitive trie coupling
        # (reference: nqs/nqs/utils/trie.py:94-125,
        # pauli_observable.py:682-696).
        membership: str = "auto",
        lookup_kernel: str = "xla",  # 'xla' | 'pallas' (hash path only)
        # max queries per membership-lookup chunk ((chunk, 128)-row gather
        # intermediate ~= chunk * 512 B of HBM); None = no chunking
        lookup_chunk: Optional[int] = 1 << 22,
        # prefilter knobs: per-row connected-pair capacity for the top_k
        # compaction; rows exceeding it fall back to a dense lookup over
        # all M groups, up to `prefilter_dense_rows` such rows per batch.
        prefilter_row_capacity: int = 64,
        prefilter_dense_rows: int = 256,
        # Row-block size for the prefilter's stage 1-3a pipeline. The
        # fingerprint pass, top_k compaction, and matrix elements all
        # materialize (B, M)-shaped intermediates; at Cr2 scale
        # (B=2048, M=472k) that is ~3.9 GB PER tensor and the step OOMs
        # HBM at compile time (measured: 20.9 G needed of 15.75 G).
        # Setting a block size runs those stages in lax.map row blocks so
        # the peak is (block, M); None = unchunked (fine through C2H4
        # scale, M ~ 21k).
        pf_row_chunk: Optional[int] = None,
        # membership='hash_dist' only: device mesh whose `mesh_axis` shards
        # the sample rows; the hash table is sharded bucket-wise over the
        # same axis with all_to_all query routing
        # (parallel/dist_membership.py).
        mesh=None,
        mesh_axis: str = "data",
        # hash_dist routing-capacity slack factors (uniform-hash sizing
        # x slack); the driver's overflow policy doubles these when routed
        # entries/queries overflow (experiments/vmc.py overflow_policy).
        dist_entry_slack: float = 4.0,
        dist_query_slack: float = 1.5,
        # Extra log2 bucket-count bits for the hash builds (escalation
        # hook for bucket overflow; 0 = the default ~25%-load sizing).
        hash_extra_bits: int = 0,
        # Entries per hash bucket (W <= 2 only; None = 32). Smaller rows
        # cut BOTH the per-query gather width and the compare-pass bytes
        # ~proportionally (the lookup is gather-issue + vector-pass
        # bound); epb=8 uses 32-lane rows at the same ~25% load (more,
        # smaller buckets) with a slightly fatter Poisson overflow tail --
        # which the driver's overflow policy escalates away.
        hash_epb: Optional[int] = None,
        # Direct-address table row width, in (la, ph) pairs. 64 = the
        # 128-lane interleaved layout (one row gather + two one-hot lane
        # selects). 1 = a (2^n, 2) layout: row gathers are flat-cost for
        # 8..128 lanes (DESIGN_NOTES), and one (q, 2) gather needs NO
        # lane-select passes at all.
        table_pairs_per_row: int = 64,
    ):
        self.qubit_num = ham.qubit_num
        self.constant = float(ham.constant)
        self.n_groups = ham.n_groups
        self.n_terms = ham.n_terms
        self.me_chunk = me_chunk
        if weights_matmul == "auto":
            weights_matmul = (
                "grouped"
                if ham.n_terms * ham.n_groups * 2 > (1 << 29)
                else "split"
            )
        self.weights_matmul = weights_matmul
        if weights_matmul == "grouped":
            ham = self._regroup_by_size_class(ham)
        words = ham.a_masks.shape[1]
        if membership == "auto":
            if ham.qubit_num <= self.MAX_TABLE_QUBITS:
                membership = "table"
            elif words <= 4:
                membership = "prefilter"
            else:
                membership = "search"
        self.membership = membership
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if membership == "hash_dist":
            assert mesh is not None, "hash_dist needs a device mesh"
        self.lookup_kernel = lookup_kernel
        self.lookup_chunk = lookup_chunk
        self.prefilter_row_capacity = prefilter_row_capacity
        self.prefilter_dense_rows = prefilter_dense_rows
        self.pf_row_chunk = pf_row_chunk
        self.dist_entry_slack = dist_entry_slack
        self.dist_query_slack = dist_query_slack
        self.hash_extra_bits = hash_extra_bits
        if hash_epb is not None:
            assert words <= 2 and hash_epb in (8, 16, 32)
        self.hash_epb = hash_epb
        assert table_pairs_per_row in (1, 64)
        self.table_pairs_per_row = table_pairs_per_row
        if membership == "prefilter":
            assert words <= 4, "prefilter supports <= 128 qubits"

        self.a_words = jnp.asarray(ham.a_masks)  # (M, W) uint32

        # Sign-matmul operand: bits of the B (yz) masks, (n, T).
        # Vectorized over qubits: the per-(term, qubit) Python loop is
        # O(T * n) -- 188M iterations (hours) at Cr2 scale (T=2.24M,
        # n=84).
        b_bits = np.stack(
            [
                (ham.b_words[:, j // 32] >> np.uint32(j % 32)) & 1
                for j in range(self.qubit_num)
            ]
        ).astype(np.float32)
        self.b_bits = jnp.asarray(b_bits, dtype=jnp.dtype(sign_dtype))
        self.sign_dtype = jnp.dtype(sign_dtype)

        group_sizes = np.diff(ham.group_starts).astype(np.int64)
        group_id = np.repeat(
            np.arange(ham.n_groups, dtype=np.int64), group_sizes
        )
        if weights_matmul == "grouped":
            # Per-class (M_c, k_c) weight blocks; no dense (T, M) operand.
            self.group_weights = None
            self.group_weight_splits = ()
            w_all = ham.weights.astype(np.float32)
            blocks, off = [], 0
            for mc, kc in self.me_classes:
                blocks.append(
                    jnp.asarray(w_all[off : off + mc * kc].reshape(mc, kc))
                )
                off += mc * kc
            assert off == ham.n_terms
            self.me_class_weights = tuple(blocks)
        else:
            # Weight-folded group one-hot (T, M) for the second matmul.
            g = np.zeros((ham.n_terms, ham.n_groups), dtype=np.float32)
            g[np.arange(ham.n_terms), group_id] = ham.weights.astype(
                np.float32
            )
            self.group_weights = jnp.asarray(g)
            # Split-weight decomposition: G = sum of 3 successive bf16
            # residual rounds, covering the full f32 mantissa.
            # Default-precision MXU matmuls against the +-1 sign matrix
            # then reproduce the f32 result exactly at half the cost of
            # Precision.HIGHEST.
            #
            # The bf16 cast happens HOST-SIDE (ml_dtypes): a bfloat16
            # device->host transfer through the axon tunnel permanently
            # degrades later dispatches of gather-bearing programs to
            # ~475 ms each (measured; see CLAUDE.md "environment facts").
            import ml_dtypes

            splits = []
            residual = g.astype(np.float32)
            for _ in range(3):  # 3 bf16 terms cover the full f32 mantissa
                part = residual.astype(ml_dtypes.bfloat16)
                splits.append(jnp.asarray(part))
                residual = residual - part.astype(np.float32)
            self.group_weight_splits = tuple(splits)
            self.me_class_weights = ()
        self.group_id = jnp.asarray(group_id, dtype=jnp.int32)
        self.weights = jnp.asarray(ham.weights, dtype=jnp.float32)

        # Complex-weight (odd-Y) channel: a per-group phase on the
        # matrix element <x^A|H_m|x> = e^{i off_m} sum_b w (-1)^{b.x}
        # (reference: complex weights, pauli_observable.py:150-183).
        # E_loc needs the CONJUGATE direction <x|H|x^A>, so the combines
        # rotate dph by -off_m. None for real Hamiltonians (all JW
        # molecular cases): zero added work on the flagship path.
        if ham.phase_offsets is not None and np.any(ham.phase_offsets):
            self.group_phase = jnp.asarray(
                ham.phase_offsets, dtype=jnp.float32
            )
            assert self.membership not in ("prefilter", "hash_dist"), (
                "the prefilter/hash_dist compaction paths do not carry "
                "the per-group phase channel; use table/search/hash/"
                "sector membership for odd-Y (imaginary-weight) "
                "Hamiltonians"
            )
        else:
            self.group_phase = None

    # ------------------------------------------------------------------
    def _regroup_by_size_class(
        self, ham: PauliHamiltonian
    ) -> PauliHamiltonian:
        """Reorder groups by power-of-two-padded size class and pad each
        group's term block to its class size (pad terms: B = 0 -> sign +1,
        weight 0 -> zero contribution). Sets ``self.me_classes`` =
        [(groups_in_class, padded_size), ...] in stream order; the
        returned Hamiltonian's ``a_masks`` are in class-major order, which
        becomes the engine's group order (membership and combine only need
        me columns to match ``a_words`` rows)."""
        sizes = np.diff(ham.group_starts).astype(np.int64)
        kpad = np.array(
            [1 << int(max(0, (int(s) - 1).bit_length())) for s in sizes],
            dtype=np.int64,
        )
        order = np.argsort(kpad, kind="stable")
        w_words = ham.b_words.shape[1]
        b_parts, w_parts, starts = [], [], [0]
        classes = []
        for m in order:
            k = int(kpad[m])
            s, e = int(ham.group_starts[m]), int(ham.group_starts[m + 1])
            pad = k - (e - s)
            b_parts.append(ham.b_words[s:e])
            w_parts.append(ham.weights[s:e])
            if pad:
                b_parts.append(np.zeros((pad, w_words), dtype=np.uint32))
                w_parts.append(np.zeros(pad, dtype=ham.weights.dtype))
            starts.append(starts[-1] + k)
            if classes and classes[-1][1] == k:
                classes[-1][0] += 1
            else:
                classes.append([1, k])
        self.me_classes = [(int(mc), int(kc)) for mc, kc in classes]
        return PauliHamiltonian(
            qubit_num=ham.qubit_num,
            constant=ham.constant,
            a_masks=ham.a_masks[order],
            b_words=np.vstack(b_parts),
            weights=np.concatenate(w_parts),
            group_starts=np.asarray(starts, dtype=np.int64),
            phase_offsets=(
                None if ham.phase_offsets is None
                else np.asarray(ham.phase_offsets)[order]
            ),
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _fp32(lo, hi):
        """Independent 32-bit key fingerprint (distinct constants from the
        bucket hash so (bucket, fp) behave as independent hashes). The
        zero value is reserved for empty fingerprint slots."""
        acc = lo * jnp.uint32(0x9E3779B1)
        acc = acc ^ (acc >> jnp.uint32(16))
        acc = (acc ^ hi) * jnp.uint32(0x85EBCA77)
        acc = acc ^ (acc >> jnp.uint32(13))
        acc = acc * jnp.uint32(0xC2B2AE3D)
        acc = acc ^ (acc >> jnp.uint32(16))
        return acc | jnp.uint32(1)

    @staticmethod
    def _mix2(lo, hi):
        """Two-round avalanche mix of two uint32 words (shared with the
        Pallas hash kernel, ops/pallas_kernels.hash_lookup)."""
        acc = lo * jnp.uint32(2654435761)
        acc = acc ^ (acc >> jnp.uint32(15))
        acc = (acc ^ hi) * jnp.uint32(2654435761)
        acc = acc ^ (acc >> jnp.uint32(15))
        acc = acc * jnp.uint32(2246822519)
        acc = acc ^ (acc >> jnp.uint32(13))
        return acc

    @staticmethod
    def _padded_cols(cols):
        """Pad a 1-word column tuple to the 2-word layout (hi = 0)."""
        if len(cols) == 1:
            return (cols[0], jnp.zeros_like(cols[0]))
        return tuple(cols)

    @classmethod
    def _bucket_hash(cls, cols):
        """Bucket hash over W uint32 key words: the 2-word avalanche mix,
        folded left over any extra words. Identical to ``_mix2(lo, hi)``
        for W <= 2 (so the Pallas kernel and the distributed path stay
        bit-compatible); the reference's membership is word-count-agnostic
        the same way (reference: nqs/nqs/base/hilbert_space.py:263-284)."""
        cols = cls._padded_cols(cols)
        acc = cls._mix2(cols[0], cols[1])
        for c in cols[2:]:
            acc = cls._mix2(acc, c)
        return acc

    @classmethod
    def _fp_hash(cls, cols):
        """Fingerprint over W key words (independent constants from the
        bucket hash); equals ``_fp32(lo, hi)`` for W <= 2."""
        cols = cls._padded_cols(cols)
        acc = cls._fp32(cols[0], cols[1])
        for c in cols[2:]:
            acc = cls._fp32(acc, c)
        return acc

    # ------------------------------------------------------------------
    def matrix_elements(self, words) -> jnp.ndarray:
        """(B, W) packed sources -> (B, M) elements <x ^ A_m | H | x>.

        Group sums are symmetric under x <-> x^A for a real Hamiltonian, so
        signs are evaluated on the source x only.
        """
        def chunk_me(w):
            x_bits = bitops.unpack(w, self.qubit_num, dtype=jnp.float32)
            if self.weights_matmul == "pallas":
                from ..ops.pallas_kernels import fused_matrix_elements

                return fused_matrix_elements(
                    x_bits.astype(jnp.bfloat16),
                    self.b_bits.astype(jnp.bfloat16),
                    self.group_weight_splits,
                )
            p = jnp.dot(
                x_bits.astype(self.sign_dtype),
                self.b_bits,
                preferred_element_type=jnp.float32,
            )
            sign = 1.0 - 2.0 * jnp.mod(p, 2.0)
            if self.weights_matmul == "grouped":
                # Class-major weighted reduces: exact f32 products of
                # +-1 signs with f32 weights, no (T, M) dense operand.
                outs, off = [], 0
                for wcls, (mc, kc) in zip(
                    self.me_class_weights, self.me_classes
                ):
                    blk = sign[:, off : off + mc * kc].reshape(-1, mc, kc)
                    outs.append(jnp.einsum("bmk,mk->bm", blk, wcls))
                    off += mc * kc
                return jnp.concatenate(outs, axis=1)
            # The default TPU matmul multiplies f32 operands in bfloat16,
            # which costs ~1e-3 relative error on the weight sums --
            # unacceptable for Hartree-scale energies. The sign matmul above
            # is exact at any precision (0/1 operands, integer-valued f32
            # accumulation); the weights matmul needs one of:
            if self.weights_matmul == "highest":
                return jnp.dot(
                    sign, self.group_weights,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            if self.weights_matmul == "fast":
                return jnp.dot(
                    sign, self.group_weights,
                    preferred_element_type=jnp.float32,
                )
            # 'split': three bf16 matmuls reconstruct the f32 weights to
            # full mantissa against a +-1 left operand (bf16 products with
            # +-1 are exact; residual splits carry the low bits). Half the
            # cost of Precision.HIGHEST at the same accuracy.
            sign_b = sign.astype(jnp.bfloat16)
            me = None
            for part in self.group_weight_splits:
                term = jnp.dot(
                    sign_b, part, preferred_element_type=jnp.float32
                )
                me = term if me is None else me + term
            return me

        if self.me_chunk is None or words.shape[0] <= self.me_chunk:
            return chunk_me(words)
        b = words.shape[0]
        pad = (-b) % self.me_chunk
        w = jnp.pad(words, ((0, pad), (0, 0)))
        out = jax.lax.map(
            chunk_me, w.reshape(-1, self.me_chunk, words.shape[1])
        )
        return out.reshape(-1, self.n_groups)[:b]

    # ------------------------------------------------------------------
    def local_energy_proxy(
        self,
        sorted_words,  # (B, W) canonically sorted samples
        log_abs,  # (B,)
        phase,  # (B,)
        valid,  # (B,) bool; invalid rows must never match (see note)
    ) -> LocalEnergies:
        """Sample-aware local energies over the unique sampled set.

        E_loc(x) = sum_m <x|H|x^A_m> psi(x^A_m)/psi(x) restricted to
        x^A_m in the sampled set (+ the identity/constant term).

        ``sorted_words`` rows for invalid entries must be sorted to a
        sentinel region (e.g. all-ones words) so lookups cannot match them.

        Membership uses a direct-address table for <= MAX_TABLE_QUBITS
        qubits (log|psi| and phase scattered into 2^n-entry tables; one
        gather pass each) -- ~13x cheaper than the sorted binary search on
        TPU, where a 4.4M-element gather pass costs ~35 ms and the
        13-round search ~450 ms (measured, v5e). Larger systems fall back
        to the binary search.
        """
        if self.membership == "table":
            return self._proxy_via_table(sorted_words, log_abs, phase, valid)
        if self.membership == "hash":
            return self._proxy_via_hash(sorted_words, log_abs, phase, valid)
        if self.membership == "hash_dist":
            return self._proxy_via_hash_dist(
                sorted_words, log_abs, phase, valid
            )
        if self.membership == "prefilter":
            return self._proxy_via_prefilter(
                sorted_words, log_abs, phase, valid
            )
        b, w = sorted_words.shape
        m = self.a_words.shape[0]

        xp = sorted_words[:, None, :] ^ self.a_words[None, :, :]  # (B, M, W)
        idx, found = keys.searchsorted_words(
            sorted_words, xp.reshape(b * m, w)
        )
        idx = idx.reshape(b, m)
        found = found.reshape(b, m) & valid[:, None]

        me = self.matrix_elements(sorted_words)  # (B, M)

        safe_idx = jnp.clip(idx, 0, b - 1)
        la_p = log_abs[safe_idx]
        ph_p = phase[safe_idx]
        return self._combine(
            me, la_p, ph_p, found, log_abs, phase, valid
        )

    def _amp_row_table(self, n_slots, slot_idx, log_abs, phase, ok):
        """Interleaved (log|psi|, phase) row table over ``n_slots``
        COMPACT slots: 64 pairs per 128-lane row, so ONE row gather (the
        expensive op on TPU; ~1.9 ns/row flat in width, DESIGN_NOTES)
        fetches both values of a partner. Slots not written by any
        ``ok`` entry hold NEG in the log|psi| lane (-> found=False)."""
        neg = jnp.float32(-1e30)
        n_rows = -(-n_slots // 64)
        lane = jnp.arange(128, dtype=jnp.int32)
        tab = jnp.broadcast_to(
            jnp.where(lane % 2 == 0, neg, 0.0).astype(jnp.float32),
            (n_rows, 128),
        )
        row = jnp.where(ok, slot_idx >> 6, n_rows)
        col = (slot_idx & 63) * 2
        tab = tab.at[row, col].set(
            jnp.where(ok, log_abs, neg), mode="drop"
        )
        tab = tab.at[row, col + 1].set(phase, mode="drop")
        return tab

    def _amp_row_lookup(self, tab, q_idx):
        """Chunked (log|psi|, phase) lookups of compact slot indices
        against an ``_amp_row_table``; returns arrays shaped like
        ``q_idx``."""

        def lookup(q):
            rows_g = tab[q >> 6]
            qc = (q & 63) * 2
            sel_la = jax.nn.one_hot(qc, 128, dtype=jnp.float32)
            sel_ph = jax.nn.one_hot(qc + 1, 128, dtype=jnp.float32)
            return (
                jnp.sum(rows_g * sel_la, axis=-1),
                jnp.sum(rows_g * sel_ph, axis=-1),
            )

        la_p, ph_p = self._chunked_queries(lookup, (q_idx.reshape(-1),))
        return la_p.reshape(q_idx.shape), ph_p.reshape(q_idx.shape)

    def local_energy_static(
        self, words, log_abs, phase, valid, partner_idx, partner_found
    ) -> LocalEnergies:
        """Sample-aware local energies over a FIXED sorted basis with
        membership resolved at setup time (exact-summation mode): the
        sector never changes, so the (N, M) partner indices are one
        host-side searchsorted at init and the per-iteration table
        build / hash / search disappears -- partner amplitudes are plain
        gathers. ~2.5x cheaper than the dynamic table path at N2 scale
        (the reference has no exact-summation mode; this is the static
        specialization of its sample-aware proxy E_loc)."""
        me = self.matrix_elements(words)
        neg = jnp.float32(-1e30)
        b = log_abs.shape[0]
        i = jnp.arange(b, dtype=jnp.int32)
        tab = self._amp_row_table(b, i, log_abs, phase, valid)
        la_p, ph_p = self._amp_row_lookup(tab, partner_idx)
        found = partner_found & (la_p > 0.5 * neg) & valid[:, None]
        return self._combine(me, la_p, ph_p, found, log_abs, phase, valid)

    def local_energy_sector(
        self, words, log_abs, phase, valid,
        sector_words, partner_idx, partner_found, sector_pos=None,
    ) -> LocalEnergies:
        """Sampled-set local energies with membership via the PRECOMPUTED
        sector connectivity: when the (N_alpha, N_beta) sector is
        enumerable, every connected partner's SECTOR index is a static
        (N, M) table built once at init, so the per-iteration work
        reduces to (a) one binary search of the B sampled words into the
        static sorted sector, (b) scattering the sampled amplitudes into
        a compact sector-indexed row table, and (c) B x M row gathers.
        Unlike the dynamic direct-address table (2^n addresses, 8 MB at
        N2 scale), the compact table is sector-sized (~113 KB) -- VMEM-
        class gathers instead of HBM, measured ~2.6x cheaper end-to-end
        at the N2 flagship shape. The reference's membership is always
        dynamic (nqs/nqs/base/hilbert_space.py:263-284); this is the
        sampled-mode analogue of ``local_energy_static``."""
        me = self.matrix_elements(words)
        neg = jnp.float32(-1e30)
        n_sector = sector_words.shape[0]
        if sector_pos is not None:
            # Direct-address sample -> sector-index map (one gather per
            # sample instead of a W-word binary search; also frees the
            # caller from canonically sorting the sample set).
            size = sector_pos.shape[0]
            key32 = words[:, 0]
            safe_key = valid & (key32 < jnp.uint32(size))
            sidx = jnp.where(
                safe_key,
                sector_pos[
                    jnp.where(safe_key, key32, 0).astype(jnp.int32)
                ],
                -1,
            )
            sfound = sidx >= 0
        else:
            sidx, sfound = keys.searchsorted_words(sector_words, words)
        ok = valid & sfound
        safe_s = jnp.clip(sidx, 0, n_sector - 1)
        pidx = partner_idx[safe_s]  # (B, M) row gather, static table
        pfnd = partner_found[safe_s] & ok[:, None]
        if self.table_pairs_per_row == 1:
            # (N, 2) layout: one narrow row gather per query, no
            # lane-select passes (see _proxy_via_table2).
            slot = jnp.where(ok, sidx, n_sector)
            tab = jnp.full((n_sector + 1, 2), neg, dtype=jnp.float32)
            tab = tab.at[slot, 0].set(
                jnp.where(ok, log_abs, neg), mode="drop"
            )
            tab = tab.at[slot, 1].set(phase, mode="drop")

            def lookup(q):
                rows_g = tab[q]
                return rows_g[..., 0], rows_g[..., 1]

            la_p, ph_p = self._chunked_queries(
                lookup, (pidx.reshape(-1),)
            )
            la_p = la_p.reshape(pidx.shape)
            ph_p = ph_p.reshape(pidx.shape)
        else:
            tab = self._amp_row_table(n_sector, sidx, log_abs, phase, ok)
            la_p, ph_p = self._amp_row_lookup(tab, pidx)
        found = pfnd & (la_p > 0.5 * neg)
        return self._combine_via_t(
            me, la_p, ph_p, found, log_abs, phase, valid
        )

    def _proxy_via_table(self, words, log_abs, phase, valid):
        """Membership + partner amplitudes via a 2^n direct-address table.

        TPU-tuned layout: (log|psi|, phase) pairs interleaved 64-keys-per-
        128-lane row, so ONE row gather (the expensive op: per-index gather
        overhead dominates on TPU, ~8 ns/index) fetches both values; lane
        selection is a pair of one-hot reductions fused into the same pass.
        Measured ~2.4x faster than per-element 1D gathers and ~30x faster
        than sorted binary search at (8192 x 536) scale on v5e.
        """
        n = self.qubit_num
        size = 1 << n
        neg = jnp.float32(-1e30)
        if self.table_pairs_per_row == 1:
            return self._proxy_via_table2(words, log_abs, phase, valid)
        n_rows = max(size >> 6, 1)
        lane = jnp.arange(128, dtype=jnp.int32)
        # Even lanes hold log|psi| (fill NEG = absent), odd lanes phase.
        tab = jnp.broadcast_to(
            jnp.where(lane % 2 == 0, neg, 0.0), (n_rows, 128)
        )
        keys_flat = words[:, 0]  # uint32; n <= 22 so in range
        safe = valid & (keys_flat < jnp.uint32(size))
        kf = keys_flat.astype(jnp.int32)
        row = jnp.where(safe, kf >> 6, n_rows)
        col = (kf & 63) * 2
        tab = tab.at[row, col].set(
            jnp.where(safe, log_abs, neg), mode="drop"
        )
        tab = tab.at[row, col + 1].set(phase, mode="drop")

        xp_keys = (
            words[:, 0][:, None] ^ self.a_words[:, 0][None, :]
        )  # (B, M) uint32; sentinel rows map out of range

        def lookup(q):
            qr = (q >> 6).astype(jnp.int32)
            qr = jnp.where(q < jnp.uint32(size), qr, n_rows)
            rows_g = tab.at[qr].get(mode="fill", fill_value=-1e30)
            qc = ((q & jnp.uint32(63)) * 2).astype(jnp.int32)
            sel_la = jax.nn.one_hot(qc, 128, dtype=jnp.float32)
            sel_ph = jax.nn.one_hot(qc + 1, 128, dtype=jnp.float32)
            return (
                jnp.sum(rows_g * sel_la, axis=-1),
                jnp.sum(rows_g * sel_ph, axis=-1),
            )

        la_p, ph_p = self._chunked_queries(lookup, (xp_keys.reshape(-1),))
        la_p = la_p.reshape(xp_keys.shape)
        ph_p = ph_p.reshape(xp_keys.shape)
        found = (la_p > 0.5 * neg) & valid[:, None]

        me = self.matrix_elements(words)
        return self._combine(me, la_p, ph_p, found, log_abs, phase, valid)

    def _proxy_via_table2(self, words, log_abs, phase, valid):
        """Direct-address membership with a (2^n, 2) table: one (q, 2)
        row gather per query and NO lane-select passes (row gathers are
        flat-cost in width, so the 128-lane interleaved layout's two
        one-hot select passes over (Q, 128) intermediates are pure
        overhead)."""
        n = self.qubit_num
        size = 1 << n
        neg = jnp.float32(-1e30)
        keys_flat = words[:, 0]
        safe = valid & (keys_flat < jnp.uint32(size))
        kf = jnp.where(safe, keys_flat.astype(jnp.int32), size)
        tab = jnp.full((size, 2), neg, dtype=jnp.float32)
        tab = tab.at[kf, 0].set(jnp.where(safe, log_abs, neg), mode="drop")
        tab = tab.at[kf, 1].set(phase, mode="drop")

        xp_keys = (
            words[:, 0][:, None] ^ self.a_words[:, 0][None, :]
        )  # (B, M)

        def lookup(q):
            qi = jnp.where(q < jnp.uint32(size), q.astype(jnp.int32), 0)
            rows_g = tab[qi]  # (chunk, 2)
            la = jnp.where(q < jnp.uint32(size), rows_g[..., 0], neg)
            return la, rows_g[..., 1]

        la_p, ph_p = self._chunked_queries(lookup, (xp_keys.reshape(-1),))
        la_p = la_p.reshape(xp_keys.shape)
        ph_p = ph_p.reshape(xp_keys.shape)
        found = (la_p > 0.5 * neg) & valid[:, None]

        me = self.matrix_elements(words)
        return self._combine(me, la_p, ph_p, found, log_abs, phase, valid)

    def _chunked_queries(self, fn, arrays):
        """Run ``fn`` (flat query arrays -> tuple of flat outputs) in
        lax.map chunks of ``lookup_chunk`` queries, bounding the (chunk,
        128)-row gather intermediate (Li2O-sized B x M blows HBM
        unchunked: 30M queries x 128 lanes x 4 B = 15 GB)."""
        n = arrays[0].shape[0]
        chunk = self.lookup_chunk
        if chunk is None or n <= chunk:
            return fn(*arrays)
        pad = (-n) % chunk
        stacked = tuple(
            jnp.pad(a, (0, pad)).reshape(-1, chunk) for a in arrays
        )
        outs = jax.lax.map(lambda t: fn(*t), stacked)
        return tuple(o.reshape(-1)[:n] for o in outs)

    def _proxy_via_hash(self, words, log_abs, phase, valid):
        """Membership via bucketed hash rows -- any qubit count.

        Same single-row-gather cost model as the direct-address table, but
        the row is a HASH BUCKET: 128 lanes hold ``epb`` entries of
        (key words bitcast to f32, log|psi|, phase). Build: samples are
        ranked within their bucket by a stable sort over bucket ids and
        scattered to (bucket, rank) slots. Query: gather the bucket row of
        each connected key, compare the key lanes, select the matching
        entry's amplitude lanes. Buckets are dimensioned to ~25% average
        load; overflow beyond ``epb`` entries (Poisson tail, ~1e-11 at
        these sizes) is counted in ``table_overflow``.
        """
        b, w = words.shape
        neg = jnp.float32(-1e30)
        tab, nb, overflow_count = self._hash_build(
            words, log_abs, phase, valid
        )

        xp_cols = tuple(
            words[:, i][:, None] ^ self.a_words[:, i][None, :]
            for i in range(w)
        )
        shape = xp_cols[0].shape
        if (
            self.lookup_kernel == "pallas"
            and w <= 2
            and (self.hash_epb or 32) == 32
        ):
            from ..ops.pallas_kernels import hash_lookup

            xp_lo, xp_hi = self._padded_cols(xp_cols)
            la_p, ph_p, found = hash_lookup(
                tab, xp_lo.reshape(-1), xp_hi.reshape(-1)
            )
            la_p = la_p.reshape(shape)
            ph_p = ph_p.reshape(shape)
            found = found.reshape(shape) & valid[:, None]
        else:
            la_p, ph_p = self._hash_query(
                tab, nb, tuple(c.reshape(-1) for c in xp_cols)
            )
            la_p = la_p.reshape(shape)
            ph_p = ph_p.reshape(shape)
            found = (la_p > 0.5 * neg) & valid[:, None]

        me = self.matrix_elements(words)
        out = self._combine(me, la_p, ph_p, found, log_abs, phase, valid)
        return out._replace(table_overflow=overflow_count)

    def _proxy_via_hash_dist(self, words, log_abs, phase, valid):
        """Membership via a device-SHARDED bucket table: each mesh device
        owns nb/D contiguous buckets; entries and queries are routed to
        their owner with fixed-capacity all_to_alls and answered with the
        same planar one-row-gather lookup as the replicated hash path.
        Bit-exact vs membership='hash' (tests/test_dist_membership.py);
        table memory and gather work scale 1/D with the mesh."""
        from ..parallel.dist_membership import hash_membership_dist

        neg = jnp.float32(-1e30)
        la_p, ph_p, overflow_count = hash_membership_dist(
            self.mesh, self.mesh_axis, words, log_abs, phase, valid,
            self.a_words, lookup_chunk=self.lookup_chunk,
            entry_slack=self.dist_entry_slack,
            query_slack=self.dist_query_slack,
        )
        found = (la_p > 0.5 * neg) & valid[:, None]
        me = self.matrix_elements(words)
        out = self._combine(me, la_p, ph_p, found, log_abs, phase, valid)
        return out._replace(table_overflow=overflow_count)

    def _hash_build(self, words, log_abs, phase, valid, with_fp=False):
        """Scatter (key, log|psi|, phase) entries of the valid sample rows
        into planar hash-bucket rows. Returns (table, n_buckets,
        overflow_count), plus a (n_buckets, 32) uint32 fingerprint table
        when ``with_fp`` (same bucket/rank assignment, so fingerprint
        membership has no false negatives relative to the full table).

        PLANAR bucket layout: lanes [0,32) key_lo, [32,64) key_hi,
        [64,96) log|psi|, [96,128) phase -- contiguous lane ranges per
        field (a strided entry-major layout forces lane relayouts on TPU,
        measured ~4x slower). Entries are ranked within their bucket by a
        stable sort over bucket ids; buckets are dimensioned to ~25%
        average load, so overflow beyond 32 entries is a Poisson tail
        (~1e-11), counted when it happens.
        """
        b, w = words.shape
        assert w <= 4, "hash membership supports <= 128 qubits"
        # Default layout -- W <= 2: 32 entries/bucket, fields at lanes
        # 0/32/64/96 (what the Pallas kernel reads). W in (3, 4): 16
        # entries/bucket at 16-lane strides. ``hash_epb`` shrinks the
        # rows (8 entries -> 32-lane rows) to cut gather width and
        # compare-pass bytes; the nb formula keeps ~25% load either way.
        epb = self.hash_epb or (32 if w <= 2 else 16)
        nk = max(w, 2)  # stored key fields (1-word keys pad hi = 0)
        nb = 1 << (
            max(8, (4 * b // epb - 1).bit_length()) + self.hash_extra_bits
        )
        neg = jnp.float32(-1e30)

        cols = self._padded_cols(tuple(words[:, i] for i in range(w)))
        bucket = jnp.where(
            valid,
            (self._bucket_hash(cols) & jnp.uint32(nb - 1)).astype(
                jnp.int32
            ),
            nb,
        )
        iota = jnp.arange(b, dtype=jnp.int32)
        sorted_b, sorted_i = jax.lax.sort(
            (bucket, iota), num_keys=1, is_stable=True
        )
        run_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_b[1:] != sorted_b[:-1]]
        )
        start_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(run_start, iota, 0)
        )
        rank_sorted = iota - start_idx
        rank = jnp.zeros(b, jnp.int32).at[sorted_i].set(rank_sorted)
        overflow = valid & (rank >= epb)
        lane = rank

        # Key lanes read as f32 bitcasts; emptiness is signaled by
        # log_abs == NEG (a stored key lane of zeros cannot false-positive
        # because its la lane stays NEG).
        tab = jnp.full((nb, (nk + 2) * epb), neg, dtype=jnp.float32)
        row_i = jnp.where(valid & ~overflow, bucket, nb)
        for i, c in enumerate(cols):
            tab = tab.at[row_i, lane + i * epb].set(
                jax.lax.bitcast_convert_type(c, jnp.float32), mode="drop"
            )
        tab = tab.at[row_i, lane + nk * epb].set(
            jnp.where(valid, log_abs, neg), mode="drop"
        )
        tab = tab.at[row_i, lane + (nk + 1) * epb].set(phase, mode="drop")
        overflow_count = jnp.sum(overflow).astype(jnp.int32)
        if not with_fp:
            return tab, nb, overflow_count
        fptab = jnp.zeros((nb, epb), dtype=jnp.uint32).at[
            row_i, lane
        ].set(self._fp_hash(cols), mode="drop")
        return tab, nb, overflow_count, fptab

    def _hash_query(self, tab, nb, q_cols):
        """Tuple of flat uint32 query word columns -> (log|psi|, phase);
        misses get NEG. One 128-lane row gather per query + lane
        compares."""
        neg = jnp.float32(-1e30)
        w = len(q_cols)
        epb = self.hash_epb or (32 if w <= 2 else 16)
        nk = max(w, 2)

        def lookup(*qs):
            q_bucket = (
                self._bucket_hash(qs) & jnp.uint32(nb - 1)
            ).astype(jnp.int32)
            rows_g = tab[q_bucket]  # (chunk, 128)
            la_e = rows_g[..., nk * epb : (nk + 1) * epb]
            match = la_e > 0.5 * neg
            for i, q in enumerate(self._padded_cols(qs)):
                keys_i = jax.lax.bitcast_convert_type(
                    rows_g[..., i * epb : (i + 1) * epb], jnp.uint32
                )
                match = match & (keys_i == q[..., None])
            la = jnp.sum(jnp.where(match, la_e, 0.0), axis=-1)
            ph = jnp.sum(
                jnp.where(
                    match,
                    rows_g[..., (nk + 1) * epb : (nk + 2) * epb],
                    0.0,
                ),
                axis=-1,
            )
            la = jnp.where(jnp.any(match, axis=-1), la, neg)
            return la, ph

        return self._chunked_queries(lookup, tuple(q_cols))

    def _proxy_via_prefilter(self, words, log_abs, phase, valid):
        """Cheap-first membership: fingerprint pass + top_k compaction +
        exact hash verification of survivors.

        The full bucket lookup pays one 128-lane row gather PLUS ~7
        lane-shaped compare/select ops per (sample, group) query (~9 ns/q
        on v5e; every op on a (Q, <=128) gathered-row array costs a full
        vreg row because sub-128 minor dims pad to 128 lanes). The
        fingerprint pass needs one 32-lane uint32 row gather, ONE lane
        compare, and an MXU reduction (~3.5 ns/q), with exactness
        guaranteed by construction:

        1. Fingerprint pass over all (B, M) connected keys: candidate iff
           any entry of the key's bucket has the query's 32-bit
           fingerprint. Same bucket/rank assignment as the full table, so
           NO false negatives; false positives ~ 32/2^32 per query.
        2. Compaction: per-row ``top_k`` (sorting-network vector work, no
           gathers) keeps up to ``prefilter_row_capacity`` candidates per
           sample -- at real workloads candidates are ~ true connected
           pairs (a handful per row).
        3. Exact verify: full 128-lane bucket lookups only for the
           B x c_row candidates. Rows with more candidates than c_row
           (a few high-amplitude determinants couple to many sampled
           partners) are re-done densely over all M groups, up to
           ``prefilter_dense_rows`` rows; rows beyond that are counted in
           ``pf_dropped_rows`` (0 == exact).

        This is the TPU re-design of the reference's output-sensitive
        trie coupling (reference: nqs/nqs/utils/trie.py:94-125,
        pauli_observable.py:682-696): same exact pair set, no pointer
        chasing.
        """
        b, w = words.shape
        m = self.n_groups
        assert w <= 4, "prefilter supports <= 128 qubits"
        neg = jnp.float32(-1e30)
        epb = self.hash_epb or (32 if w <= 2 else 16)
        c_row = min(self.prefilter_row_capacity, m)
        r_cap = self.prefilter_dense_rows

        tab, nb, build_overflow, fptab = self._hash_build(
            words, log_abs, phase, valid, with_fp=True
        )

        def fp_probe(*qs):
            bucket = (
                self._bucket_hash(qs) & jnp.uint32(nb - 1)
            ).astype(jnp.int32)
            rows_fp = fptab[bucket]  # (chunk, epb) uint32
            match = (rows_fp == self._fp_hash(qs)[..., None]).astype(
                jnp.float32
            )
            count = jnp.dot(
                match, jnp.ones((epb, 1), jnp.float32),
                preferred_element_type=jnp.float32,
            )[..., 0]
            return (count > 0.5,)

        def row_block(words_c, phase_c, valid_c):
            """Stages 1-3a over a block of sample rows: every (rows, M)
            intermediate (fingerprint hits, compaction keys, matrix
            elements) is bounded by the block size."""
            bc = words_c.shape[0]

            # --- Stage 1: (bc, M) candidate mask from the fingerprint
            # pass.
            xp_cols = tuple(
                words_c[:, i][:, None] ^ self.a_words[:, i][None, :]
                for i in range(w)
            )
            (hit_flat,) = self._chunked_queries(
                fp_probe, tuple(c.reshape(-1) for c in xp_cols)
            )
            hit = hit_flat.reshape(bc, m) & valid_c[:, None]

            # --- Stage 2: per-row compaction (descending key = hit
            # groups in ascending-m order; 0 = no candidate).
            key_mat = jnp.where(
                hit, m - jnp.arange(m, dtype=jnp.int32)[None, :], 0
            )
            row_count = jnp.sum(hit, axis=1).astype(jnp.int32)
            kvals, m_idx = jax.lax.top_k(key_mat, c_row)
            pair_ok = kvals > 0

            me = self.matrix_elements(words_c)  # (bc, M)

            # --- Stage 3a: exact verification of compacted candidates.
            q_cols = tuple(
                (
                    words_c[:, i][:, None] ^ self.a_words[:, i][m_idx]
                ).reshape(-1)
                for i in range(w)
            )
            la1, ph1 = self._hash_query(tab, nb, q_cols)
            la1 = la1.reshape(bc, c_row)
            ph1 = ph1.reshape(bc, c_row)
            found1 = (la1 > 0.5 * neg) & pair_ok
            me1 = jnp.take_along_axis(me, m_idx, axis=1)
            sums = self._combine_rows(me1, la1, ph1, found1, phase_c)
            return sums + (row_count,)

        rc = self.pf_row_chunk
        if rc is None or b <= rc:
            *sums1, row_count = row_block(words, phase, valid)
        else:
            pad_r = (-b) % rc
            wp = jnp.pad(words, ((0, pad_r), (0, 0)))
            php = jnp.pad(phase, (0, pad_r))
            vp = jnp.pad(valid, (0, pad_r))  # pads False: rows inert
            outs = jax.lax.map(
                lambda t: row_block(*t),
                (
                    wp.reshape(-1, rc, w),
                    php.reshape(-1, rc),
                    vp.reshape(-1, rc),
                ),
            )
            *sums1, row_count = tuple(
                o.reshape(-1)[:b] for o in outs
            )
        sums1 = tuple(sums1)

        # --- Stage 3b: dense fallback for rows over capacity.
        over = valid & (row_count > c_row)
        pos = jnp.cumsum(over.astype(jnp.int32)) - 1
        iota_b = jnp.arange(b, dtype=jnp.int32)
        rows_buf = jnp.full((r_cap,), b, jnp.int32).at[
            jnp.where(over & (pos < r_cap), pos, r_cap)
        ].set(iota_b, mode="drop")
        row_ok = rows_buf < b
        safe_rows = jnp.clip(rows_buf, 0, b - 1)
        rw = jnp.stack(
            [words[:, j][safe_rows] for j in range(w)], axis=-1
        )
        q2_cols = tuple(
            (rw[:, i][:, None] ^ self.a_words[:, i][None, :]).reshape(-1)
            for i in range(w)
        )
        la2, ph2 = self._hash_query(tab, nb, q2_cols)
        la2 = la2.reshape(r_cap, m)
        ph2 = ph2.reshape(r_cap, m)
        found2 = (la2 > 0.5 * neg) & row_ok[:, None]
        me2 = self.matrix_elements(rw)
        sums2 = self._combine_rows(
            me2, la2, ph2, found2, phase[safe_rows]
        )

        # --- Merge: dense-row results overwrite truncated pass-1 rows.
        scatter_to = jnp.where(row_ok, rows_buf, b)
        merged = tuple(
            s1.at[scatter_to].set(s2, mode="drop")
            for s1, s2 in zip(sums1, sums2)
        )
        s_re, s_im, t_sum_re, t_sum_im, found_per_row = merged

        ratio_scale = jnp.exp(
            jnp.clip(-jnp.where(valid, log_abs, 0.0), -60.0, 60.0)
        )
        e_re = jnp.where(valid, s_re * ratio_scale + self.constant, 0.0)
        e_im = jnp.where(valid, s_im * ratio_scale, 0.0)
        a_x = jnp.where(valid, jnp.exp(log_abs), 0.0)
        t_re = jnp.where(valid, self.constant * a_x + t_sum_re, 0.0)
        t_im = jnp.where(valid, t_sum_im, 0.0)

        n_over = jnp.sum(over).astype(jnp.int32)
        dropped = jnp.maximum(n_over - r_cap, 0)
        return LocalEnergies(
            e_re=e_re,
            e_im=e_im,
            found_pairs=jnp.sum(
                jnp.where(valid, found_per_row, 0)
            ).astype(jnp.int32),
            t_re=t_re,
            t_im=t_im,
            table_overflow=build_overflow,
            pf_dropped_rows=dropped,
        )

    @staticmethod
    def _combine_rows(me, la_p, ph_p, found, phase_x):
        """Per-row partner sums in amplitude form (no 1/|psi(x)| ratio --
        applied by the caller): returns (sum me*a_p*cos, sum me*a_p*sin,
        same pair again for the t-numerators, found count), each (B,).
        """
        amp_p = jnp.where(found, jnp.exp(jnp.where(found, la_p, 0.0)) * me,
                          0.0)
        dph = ph_p - phase_x[:, None]
        s_re = jnp.sum(amp_p * jnp.cos(dph), axis=1)
        s_im = jnp.sum(amp_p * jnp.sin(dph), axis=1)
        return (
            s_re,
            s_im,
            s_re,
            s_im,
            jnp.sum(found, axis=1).astype(jnp.int32),
        )

    def _combine_via_t(self, me, la_p, ph_p, found, log_abs, phase, valid):
        """Amplitude-form partner sums computed ONCE; the ratio-form
        local energy is derived as e = t / a_x instead of a second
        (B, M)-grid pass set (ratio/clip/contrib + two more multiply-sum
        passes in ``_combine``). Numerically equivalent except the
        overflow guard: a row-level exponent clip on 1/a_x replaces the
        per-partner ratio clip (both only bind on |log| > 60 rows,
        where e_re is a saturated diagnostic either way)."""
        dph = ph_p - phase[:, None]
        if self.group_phase is not None:
            dph = dph - self.group_phase[None, :]
        amp_p = jnp.where(found, jnp.exp(la_p) * me, 0.0)
        s_re = jnp.sum(amp_p * jnp.cos(dph), axis=1)
        s_im = jnp.sum(amp_p * jnp.sin(dph), axis=1)
        a_x = jnp.where(valid, jnp.exp(log_abs), 0.0)
        inv_a = jnp.exp(jnp.clip(-log_abs, -60.0, 60.0))
        e_re = jnp.where(valid, self.constant + s_re * inv_a, 0.0)
        e_im = jnp.where(valid, s_im * inv_a, 0.0)
        t_re = jnp.where(valid, self.constant * a_x + s_re, 0.0)
        t_im = jnp.where(valid, s_im, 0.0)
        return LocalEnergies(
            e_re=e_re,
            e_im=e_im,
            found_pairs=jnp.sum(found & valid[:, None]),
            t_re=t_re,
            t_im=t_im,
        )

    def _combine(self, me, la_p, ph_p, found, log_abs, phase, valid):
        ratio = jnp.exp(
            jnp.clip(
                jnp.where(found, la_p, 0.0) - log_abs[:, None], -60.0, 60.0
            )
        )
        dph = ph_p - phase[:, None]
        if self.group_phase is not None:
            dph = dph - self.group_phase[None, :]
        contrib = jnp.where(found, me * ratio, 0.0)
        e_re = jnp.sum(contrib * jnp.cos(dph), axis=1) + self.constant
        e_im = jnp.sum(contrib * jnp.sin(dph), axis=1)
        e_re = jnp.where(valid, e_re, 0.0)
        e_im = jnp.where(valid, e_im, 0.0)

        # Stable numerators: t_x = a_x E_x = C a_x + sum_m me a_p e^{i dph}
        # with a = exp(la) <= 1 -- bounded by sum |me|, no ratios.
        a_x = jnp.where(valid, jnp.exp(log_abs), 0.0)
        amp_p = jnp.where(found, jnp.exp(la_p) * me, 0.0)
        t_re = self.constant * a_x + jnp.sum(amp_p * jnp.cos(dph), axis=1)
        t_im = jnp.sum(amp_p * jnp.sin(dph), axis=1)
        t_re = jnp.where(valid, t_re, 0.0)
        t_im = jnp.where(valid, t_im, 0.0)
        return LocalEnergies(
            e_re=e_re,
            e_im=e_im,
            found_pairs=jnp.sum(found & valid[:, None]),
            t_re=t_re,
            t_im=t_im,
        )

    # ------------------------------------------------------------------
    def local_energy_full(
        self,
        anqs,
        params,
        words,  # (B, W) samples (need not be sorted)
        log_abs,
        phase,
        valid,
        amp_chunk: int = 4096,
    ) -> LocalEnergies:
        """Full local energies: evaluates psi at every connected x'.

        The reference's 'full energy' path
        (pauli_observable.py:992-1105) evaluates non-sampled connected
        amplitudes in chunks; here all (B, M) connected states are evaluated
        through the network via ``lax.map`` chunking.
        """
        b, w = words.shape
        m = self.a_words.shape[0]
        xp = (words[:, None, :] ^ self.a_words[None, :, :]).reshape(-1, w)

        def chunk_logpsi(chunk):
            return anqs.log_psi(params, chunk)

        pad = (-xp.shape[0]) % amp_chunk
        xp_pad = jnp.pad(xp, ((0, pad), (0, 0)))
        la_p, ph_p = jax.lax.map(
            chunk_logpsi, xp_pad.reshape(-1, amp_chunk, w)
        )
        la_p = la_p.reshape(-1)[: b * m].reshape(b, m)
        ph_p = ph_p.reshape(-1)[: b * m].reshape(b, m)

        me = self.matrix_elements(words)
        ratio = jnp.exp(jnp.clip(la_p - log_abs[:, None], -60.0, 60.0))
        dph = ph_p - phase[:, None]
        if self.group_phase is not None:
            dph = dph - self.group_phase[None, :]
        e_re = jnp.sum(me * ratio * jnp.cos(dph), axis=1) + self.constant
        e_im = jnp.sum(me * ratio * jnp.sin(dph), axis=1)
        e_re = jnp.where(valid, e_re, 0.0)
        e_im = jnp.where(valid, e_im, 0.0)
        return LocalEnergies(
            e_re=e_re, e_im=e_im,
            found_pairs=jnp.asarray(b * m, jnp.int32),
        )


def mc_estimate(values_re, values_im, weights) -> Tuple:
    """Weighted Monte-Carlo mean/variance (reference MonteCarloEstimator,
    compute_local_energies.py:47-62). ``weights`` must sum to 1 over valid
    rows (invalid rows carry weight 0)."""
    mean_re = jnp.sum(weights * values_re)
    mean_im = jnp.sum(weights * values_im)
    var = jnp.sum(
        weights * ((values_re - mean_re) ** 2 + (values_im - mean_im) ** 2)
    )
    return mean_re, mean_im, var
