"""Field arithmetic: parameters, host mirror, device limb kernels, towers."""

from .params import (
    BN254,
    BN254_FQ,
    BN254_FR,
    BLS12_381,
    BLS12_381_FQ,
    BLS12_381_FR,
    LIMB_BITS,
    LIMB_MASK,
    CurveParams,
    FieldParams,
    get_curve,
    get_field,
)
from .host import Fp, FpElem
from .towers import Fq2, Fq6, Fq12, make_tower

__all__ = [
    "BN254",
    "BN254_FQ",
    "BN254_FR",
    "BLS12_381",
    "BLS12_381_FQ",
    "BLS12_381_FR",
    "LIMB_BITS",
    "LIMB_MASK",
    "CurveParams",
    "FieldParams",
    "Fp",
    "FpElem",
    "Fq2",
    "Fq6",
    "Fq12",
    "get_curve",
    "get_field",
    "make_tower",
]
