"""Brute-force dense quantum state: a trainable 2^n table (test oracle).

Counterpart of the reference BFQuantumState
(reference: nqs/nqs/stochastic/ansatzes/bf_quantum_state.py:9-41): exact
amplitudes and exact multinomial sampling for <= ~16 qubits; the A/B partner
for ANQS components in the test suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bits as bitops


class BFState:
    def __init__(self, qubit_num: int):
        assert qubit_num <= 20
        self.qubit_num = qubit_num
        self.dim = 2**qubit_num
        self.n_words = bitops.n_words(qubit_num)

    def init(self, key, support=None):
        """Random normalized state; optionally restricted to ``support``
        (an int array of basis indices)."""
        k1, k2 = jax.random.split(key)
        log_abs = jax.random.normal(k1, (self.dim,), dtype=jnp.float32)
        phase = jnp.pi * jax.random.normal(k2, (self.dim,), dtype=jnp.float32)
        if support is not None:
            mask = jnp.zeros(self.dim, bool).at[support].set(True)
            log_abs = jnp.where(mask, log_abs, -jnp.inf)
        log_abs = log_abs - 0.5 * jax.nn.logsumexp(2.0 * log_abs)
        return {"log_abs": log_abs, "phase": phase}

    def _flat_index(self, words):
        idx = words[..., 0].astype(jnp.uint32)
        return jnp.asarray(idx, dtype=jnp.int64) % self.dim

    def log_psi(self, params, words):
        idx = self._flat_index(words)
        return params["log_abs"][idx], params["phase"][idx]

    def probs(self, params):
        p = jnp.exp(2.0 * params["log_abs"])
        return p / jnp.sum(p)

    def sample_counts(self, params, key, sample_num: int):
        """Exact multinomial over the full basis: (words, counts)."""
        p = self.probs(params)
        counts = jax.random.multinomial(
            key, sample_num, p
        ).astype(jnp.int32)
        all_bits = (
            jnp.arange(self.dim, dtype=jnp.uint32)[:, None]
            >> jnp.arange(self.qubit_num, dtype=jnp.uint32)[None, :]
        ) & 1
        words = bitops.pack(all_bits)
        return words, counts
