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

    Two interchangeable backends (select with SNARK_TPU_FIELD_IMPL):
      * "u32" (default): base-2^16 limbs in uint32 lanes — smaller XLA
        graphs, faster compiles.
      * "f32": base-2^8 digits in float32 — exact f32 arithmetic, the basis
        for the planned Mosaic fused kernels.
    Honest sync-forced measurements on v5e put both at ~6-9M Montgomery
    muls/s under plain XLA at 2^20 batch (traffic/op-overhead bound, ~30x
    off the fused roofline) — closing that gap is the Pallas kernel
    roadmap, not a representation change.
    """
    if _os.environ.get("SNARK_TPU_FIELD_IMPL", "u32") == "u32":
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
