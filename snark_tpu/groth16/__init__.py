"""Groth16 proof system: setup / prove / verify (the flagship SNARK).

QAP reduction + NTT/MSM device pipeline + host pairing verification.
"""

from .pairing import Pairing, get_pairing
from .groth16 import (
    Groth16,
    PreparedVerifyingKey,
    Proof,
    ProvingKey,
    VerifyingKey,
)
from .qap import (
    PaddedCsr,
    WitnessMapPlan,
    domain_size_for,
    evaluate_variable_polys_at_tau,
    lagrange_coeffs_at,
)

__all__ = [
    "Groth16",
    "PaddedCsr",
    "Pairing",
    "PreparedVerifyingKey",
    "Proof",
    "ProvingKey",
    "VerifyingKey",
    "WitnessMapPlan",
    "domain_size_for",
    "evaluate_variable_polys_at_tau",
    "get_pairing",
    "lagrange_coeffs_at",
]
