"""Toy-model walkthrough: every layer of the stack on LiH, step by step.

Counterpart of the reference's documented user entry point
(reference: colab_toy_model.ipynb, README.md:6-10), as a runnable script.
Runs on CPU in ~2 minutes (first run compiles; reruns are fast thanks to the
persistent XLA cache).

    JAX_PLATFORMS=cpu python examples/toy_model_walkthrough.py
"""

import jax
import numpy as np

# ---------------------------------------------------------------- molecule
# Standalone chemistry: Gaussian integrals -> RHF -> MP2/CISD/CCSD(T)/FCI
# baselines -> Jordan-Wigner bit-mask Hamiltonian. Cached under mols/.
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

mol = Molecule.create(MolConfig(name="LiH", basis="sto-3g"), mols_dir="mols")
print(f"LiH: {mol.qubit_num} qubits, {mol.n_electrons} electrons, "
      f"{mol.fci_ndet} determinants in the (N, Sz) sector")
print(f"  HF      {mol.hf_energy:.6f} Ha")
print(f"  MP2     {mol.mp2_energy:.6f}")
print(f"  CISD    {mol.cisd_energy:.6f}")
print(f"  CCSD(T) {mol.ccsd_t_energy:.6f}")
print(f"  FCI     {mol.fci_energy:.6f}   (target)")

# ---------------------------------------------------------------- symmetries
# Particle number + spin projection enforced *during* sampling via a DP
# memo table over accumulated quantum numbers.
from anqs_quantum_chemistry_tpu.experiments.preparation import create_masker
from anqs_quantum_chemistry_tpu.symmetries import QubitGrouping

masker = create_masker(mol, "e_num_spin")
grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
print(f"masker memo: {masker.memo.shape}, "
      f"{grouping.qudit_num} qudits of dims {grouping.qudit_dims}")

# ---------------------------------------------------------------- ansatz
from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig

anqs = ANQS(grouping, AnqsConfig(hidden_widths=(64,)))
params = anqs.init(jax.random.PRNGKey(0))

# ---------------------------------------------------------------- sampling
from anqs_quantum_chemistry_tpu.sampling import gumbel_top_k_sample

sample = gumbel_top_k_sample(anqs, params, jax.random.PRNGKey(1), 64)
print(f"sampled {int(np.asarray(sample.valid).sum())} distinct physical "
      f"determinants (Gumbel top-k)")

# ---------------------------------------------------------------- energy
from anqs_quantum_chemistry_tpu.observables import PauliEngine, mc_estimate
from anqs_quantum_chemistry_tpu.ops import keys
import jax.numpy as jnp

engine = PauliEngine(mol.qubit_ham)
words, _, valid = sample.words, sample.log_probs, sample.valid
sentinel = jnp.full_like(words, jnp.uint32(0xFFFFFFFF))
words = jnp.where(valid[:, None], words, sentinel)
sorted_words, _, valid_i = keys.sort_words(words, valid.astype(jnp.int32))
la, ph = anqs.log_psi(params, sorted_words)
e = engine.local_energy_proxy(sorted_words, la, ph, valid_i.astype(bool))
theor = jnp.where(valid_i.astype(bool), jnp.exp(2.0 * la), 0.0)
freqs = theor / jnp.sum(theor)
mean_re, mean_im, var = mc_estimate(e.e_re, e.e_im, freqs)
print(f"initial variational energy: {float(mean_re):.6f} Ha "
      f"(HF is {mol.hf_energy:.6f})")

# ---------------------------------------------------------------- training
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig

vmc = VMC(
    mol,
    VMCConfig(sample_num=256, sampling_mode="gumbel", qubit_per_qudit=3,
              lr=1e-2, sr=SRConfig(max_indices_num=20)),
    AnqsConfig(hidden_widths=(64,)),
    run_dir="runs/toy_lih",
)
params, opt_state, history, best = vmc.run(iter_num=1000)
gap = best["energy"] - mol.fci_energy
print(f"after 1000 iters: best {best['energy']:.6f} Ha, "
      f"gap to FCI {gap * 1000:.2f} mHa "
      f"({'chemical accuracy!' if gap < 1.6e-3 else 'keep training'})")
