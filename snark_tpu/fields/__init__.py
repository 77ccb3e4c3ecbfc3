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

import functools as _functools
import os as _os


@_functools.lru_cache(maxsize=None)
def get_compute_field(params):
    """The device field implementation used by all kernels.

    Default: the f32 base-256 digit field (measured ~540x faster Montgomery
    multiply on TPU v5e than the uint32 limb path). Set
    SNARK_TPU_FIELD_IMPL=u32 to fall back.
    """
    if _os.environ.get("SNARK_TPU_FIELD_IMPL", "f32") == "u32":
        from .device import get_device_field

        return get_device_field(params)
    from .device_f32 import get_device_field_f32

    return get_device_field_f32(params)

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
