from .basis import basis_for_atoms, Shell
from .integrals import compute_integrals_ao
from .scf import rhf
from .fci import fci_ground_state, cisd_ground_state, mp2_energy
from .jw import jordan_wigner_pauli_hamiltonian, PauliHamiltonian
from .molecule import Molecule, MolConfig, GeometryConfig
