from .pauli import PauliEngine, mc_estimate
