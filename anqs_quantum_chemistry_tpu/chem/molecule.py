"""Disk-cached molecule preparation: integrals -> RHF -> JW -> baselines.

Standalone counterpart of the reference Molecule/MolecularData/run_pyscf stack
(reference: nqs/nqs/applications/quantum_chemistry/molecule.py:102-435,
molecular_data.py:21-329, run_pyscf.py:195-314), with the external
PySCF/OpenFermion/PennyLane dependencies replaced by the in-tree chem modules.

Everything expensive is cached to ``<mols_dir>/<name>/<hash>.npz``; nothing
here is on the training hot path.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

from ..utils.config import Config
from . import fci as fci_mod
from .basis import basis_for_atoms, nuclear_repulsion, ELEMENTS
from .geometry_repo import GEOMETRIES, MULTIPLICITIES, geometry_bohr
from .integrals import compute_integrals_ao
from .jw import (
    PauliHamiltonian,
    jordan_wigner_pauli_hamiltonian,
    z_string_symmetries,
)
from .scf import mo_integrals, rhf, rohf, spin_orbital_integrals

MAX_BF_FCI_QUBITS = 20  # same exact-diagonalization cutoff as the reference
# (reference: molecular_data.py:83-89, max_fci_qubits=20)
MAX_DIRECT_CI_NDET = 2_000_000  # automatic string-based direct-CI cap; the
# reference gets such anchors from PySCF's compiled direct-CI solver
# (run_pyscf.py:266-276), here chem/direct_ci.py is the standalone equivalent.
# Larger sectors (e.g. Li2O's 41.4M) go through the explicit run_direct_fci().


@dataclasses.dataclass
class GeometryConfig(Config):
    type: str = "carleo"
    idx: int = 0
    bond_length: Optional[float] = None  # angstrom, for dissociation curves


@dataclasses.dataclass
class MolConfig(Config):
    name: str = "LiH"
    basis: str = "sto-3g"
    geometry: GeometryConfig = dataclasses.field(default_factory=GeometryConfig)
    multiplicity: Optional[int] = None
    charge: int = 0


class Molecule:
    """Everything the VMC stack needs to know about one molecule."""

    def __init__(self, config: MolConfig, run_fci: bool = True,
                 run_cisd: bool = True):
        self.config = config
        if config.name not in GEOMETRIES:
            raise ValueError(
                f"Unknown molecule '{config.name}'; available: "
                f"{sorted(GEOMETRIES)}"
            )
        geom = GEOMETRIES[config.name]
        if config.geometry.bond_length is not None:
            from .geometry_repo import linear_geometry

            geom = linear_geometry(config.name, config.geometry.bond_length)
        self.atoms = geometry_bohr(geom)
        self.multiplicity = config.multiplicity or MULTIPLICITIES.get(
            config.name, 1
        )
        self.n_electrons = (
            sum(ELEMENTS[el] for el, _ in self.atoms) - config.charge
        )

        shells = basis_for_atoms(self.atoms, config.basis)
        ints = compute_integrals_ao(self.atoms, shells)
        self.e_nuc = nuclear_repulsion(self.atoms)
        h_core = ints["T"] + ints["V"]
        self.n_alpha = (self.n_electrons + (self.multiplicity - 1)) // 2
        self.n_beta = self.n_electrons - self.n_alpha
        if self.n_alpha == self.n_beta:
            scf_res = rhf(ints["S"], h_core, ints["ERI"], self.n_electrons,
                          self.e_nuc)
        else:
            # Open shell: ROHF (single spatial-orbital set, so the
            # interleaved spin-orbital transform below applies unchanged;
            # reference uses PySCF ROHF, run_pyscf.py:228-240).
            scf_res = rohf(
                ints["S"], h_core, ints["ERI"], self.n_alpha, self.n_beta,
                self.e_nuc,
            )
        if not scf_res["converged"]:
            raise RuntimeError(f"SCF failed to converge for {config.name}")
        self.hf_energy = scf_res["hf_energy"]
        self.mo_energy = scf_res["mo_energy"]

        h_mo, eri_mo = mo_integrals(h_core, ints["ERI"], scf_res["mo_coeff"])
        self.h1, self.v = spin_orbital_integrals(h_mo, eri_mo)
        self.n_orbitals = h_mo.shape[0]
        self.qubit_num = 2 * self.n_orbitals

        self.hf_det = sum(1 << (2 * o) for o in range(self.n_alpha)) | sum(
            1 << (2 * o + 1) for o in range(self.n_beta)
        )

        self.qubit_ham: PauliHamiltonian = jordan_wigner_pauli_hamiltonian(
            self.h1, self.v, constant=self.e_nuc
        )

        if self.n_alpha == self.n_beta:
            mo_energy_so = np.repeat(self.mo_energy, 2)
            self.mp2_energy = self.hf_energy + fci_mod.mp2_energy(
                self.h1, self.v, mo_energy_so, self.hf_det
            )
        else:
            # ROHF-MP2 is not uniquely defined with Roothaan effective
            # orbital energies; the determinant-based CISD/FCI ladder
            # below covers open shells instead.
            self.mp2_energy = None

        self.cisd_energy = None
        self.ccsd_energy = None
        self.ccsd_t_energy = None
        if run_cisd:
            self._compute_correlated_baselines()

        self.fci_energy = None
        self.fci_ipr = None
        if run_fci:
            self._compute_fci()

        self.z2_generators = z_string_symmetries(self.qubit_ham)

    def _compute_fci(self) -> bool:
        """Exact sector ground state when tractable: brute-force sparse eigsh
        up to MAX_BF_FCI_QUBITS (the reference's cutoff), else the
        string-based direct-CI sigma build up to MAX_DIRECT_CI_NDET
        determinants. Returns True if an FCI anchor was computed."""
        if self.qubit_num <= MAX_BF_FCI_QUBITS:
            e, _, _, ipr = fci_mod.fci_ground_state(
                self.h1, self.v, self.n_alpha, self.n_beta, self.e_nuc
            )
            self.fci_energy = float(e)
            self.fci_ipr = float(ipr)
            return True
        if self.fci_ndet <= MAX_DIRECT_CI_NDET:
            self.run_direct_fci()
            return True
        return False

    def run_direct_fci(self, tol: float = 1e-4, verbose=lambda s: None,
                       cache_path: Optional[str] = None) -> float:
        """Direct-CI FCI anchor for sectors beyond the eigsh cap (e.g.
        Li2O/STO-3G's 41.4M-determinant sector). Optionally upgrades a
        molecule cache file in place so later ``Molecule.create`` calls see
        the anchor without re-solving."""
        from .direct_ci import direct_ci_ground_state

        res = direct_ci_ground_state(
            self.h1, self.v, self.n_alpha, self.n_beta, self.e_nuc,
            tol=tol, verbose=verbose,
        )
        self.fci_energy = float(res.energy)
        self.fci_ipr = float(res.ipr)
        if cache_path:
            self._save_cache(cache_path)
        return self.fci_energy

    def _compute_correlated_baselines(self):
        """CISD + CCSD(+T) ladder (reference run_pyscf.py:228-308)."""
        from .cc import ccsd, ccsd_t_correction

        cisd_e, _, _ = fci_mod.cisd_ground_state(
            self.h1, self.v, self.hf_det, self.e_nuc
        )
        self.cisd_energy = float(cisd_e)
        e_cc, t1, t2, cc_info = ccsd(
            self.h1, self.v, self.hf_det, self.e_nuc
        )
        if cc_info["converged"]:
            self.ccsd_energy = float(e_cc)
            self.ccsd_t_energy = float(
                e_cc + ccsd_t_correction(
                    self.h1, self.v, self.hf_det, t1, t2
                )
            )

    @property
    def fci_ndet(self) -> int:
        """FCI determinant count in the (N_alpha, N_beta) sector (the
        reference shells out to Psi4 for this, molecule.py:388-435)."""
        import math

        return math.comb(self.n_orbitals, self.n_alpha) * math.comb(
            self.n_orbitals, self.n_beta
        )

    # ------------------------------------------------------------------
    # Caching
    # ------------------------------------------------------------------
    @classmethod
    def create(cls, config: MolConfig, mols_dir: str = "mols",
               run_fci: bool = True, run_cisd: bool = True) -> "Molecule":
        """Load from cache or build and cache (reference: molecule.py:342-370).

        A cache written by a ``run_fci=False``/``run_cisd=False`` caller (e.g.
        bench.py) stores NaN sentinels for the skipped baselines; when a later
        caller *requests* them, the missing pieces are computed and the cache
        upgraded in place rather than poisoning the caller with Nones.
        """
        cache_dir = os.path.join(mols_dir, config.name)
        path = os.path.join(cache_dir, config.to_sha256_str()[:16] + ".npz")
        if os.path.exists(path):
            mol = cls._from_cache(config, path)
            upgraded = False
            if run_cisd and mol.cisd_energy is None:
                mol._compute_correlated_baselines()
                upgraded = True
            if run_fci and mol.fci_energy is None:
                upgraded = mol._compute_fci() or upgraded
            if upgraded:
                mol._save_cache(path)
            return mol
        mol = cls(config, run_fci=run_fci, run_cisd=run_cisd)
        os.makedirs(cache_dir, exist_ok=True)
        mol._save_cache(path)
        return mol

    def _save_cache(self, path: str):
        ham = self.qubit_ham
        np.savez_compressed(
            path,
            e_nuc=self.e_nuc,
            hf_energy=self.hf_energy,
            mo_energy=self.mo_energy,
            h1=self.h1,
            v=self.v,
            n_alpha=self.n_alpha,
            n_beta=self.n_beta,
            hf_det=np.array([self.hf_det], dtype=np.uint64),
            qubit_num=self.qubit_num,
            mp2_energy=np.array(
                [np.nan if self.mp2_energy is None else self.mp2_energy]
            ),
            cisd_energy=np.array(
                [np.nan if self.cisd_energy is None else self.cisd_energy]
            ),
            ccsd_energy=np.array(
                [np.nan if self.ccsd_energy is None else self.ccsd_energy]
            ),
            ccsd_t_energy=np.array(
                [
                    np.nan
                    if self.ccsd_t_energy is None
                    else self.ccsd_t_energy
                ]
            ),
            fci_energy=np.array(
                [np.nan if self.fci_energy is None else self.fci_energy]
            ),
            fci_ipr=np.array(
                [np.nan if self.fci_ipr is None else self.fci_ipr]
            ),
            multiplicity=self.multiplicity,
            n_electrons=self.n_electrons,
            ham_constant=ham.constant,
            ham_a_masks=ham.a_masks,
            ham_b_words=ham.b_words,
            ham_weights=ham.weights,
            ham_group_starts=ham.group_starts,
            z2_generators=self.z2_generators,
        )

    @classmethod
    def _from_cache(cls, config: MolConfig, path: str) -> "Molecule":
        data = np.load(path)
        mol = cls.__new__(cls)
        mol.config = config
        mol.e_nuc = float(data["e_nuc"])
        mol.hf_energy = float(data["hf_energy"])
        mol.mo_energy = data["mo_energy"]
        mol.h1 = data["h1"]
        mol.v = data["v"]
        mol.n_alpha = int(data["n_alpha"])
        mol.n_beta = int(data["n_beta"])
        mol.hf_det = int(data["hf_det"][0])
        mol.qubit_num = int(data["qubit_num"])
        mol.n_orbitals = mol.qubit_num // 2
        mp2 = float(np.asarray(data["mp2_energy"]).reshape(-1)[0])
        mol.mp2_energy = None if np.isnan(mp2) else mp2
        mol.multiplicity = int(data["multiplicity"])
        mol.n_electrons = int(data["n_electrons"])
        cisd = float(data["cisd_energy"][0])
        mol.cisd_energy = None if np.isnan(cisd) else cisd
        for attr in ("ccsd_energy", "ccsd_t_energy"):
            val = float(data[attr][0]) if attr in data else float("nan")
            setattr(mol, attr, None if np.isnan(val) else val)
        fci_e = float(data["fci_energy"][0])
        mol.fci_energy = None if np.isnan(fci_e) else fci_e
        ipr = float(data["fci_ipr"][0])
        mol.fci_ipr = None if np.isnan(ipr) else ipr
        mol.qubit_ham = PauliHamiltonian(
            qubit_num=mol.qubit_num,
            constant=float(data["ham_constant"]),
            a_masks=data["ham_a_masks"],
            b_words=data["ham_b_words"],
            weights=data["ham_weights"],
            group_starts=data["ham_group_starts"],
        )
        mol.z2_generators = data["z2_generators"]
        return mol
