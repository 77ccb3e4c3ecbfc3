"""Device kernels: radix-2 NTT, short-Weierstrass curve ops, Pippenger MSM.

The TPU-native replacement for ark-poly's evaluation domains and ark-ec's
curve/MSM kernels (SURVEY.md §2.3, §7 stage 4).
"""

from .ntt import NttPlan, get_ntt_plan
from .curve import CurveOps, G2CurveOps, DeviceFq2, get_g1_ops, get_g2_ops
from .msm import (
    FixedBasePlan,
    MsmPlan,
    get_msm_plan,
    msm,
    pick_window,
    scalars_to_digits,
)
from . import curve_host

__all__ = [
    "CurveOps",
    "DeviceFq2",
    "FixedBasePlan",
    "G2CurveOps",
    "MsmPlan",
    "NttPlan",
    "curve_host",
    "get_g1_ops",
    "get_g2_ops",
    "get_msm_plan",
    "get_ntt_plan",
    "msm",
    "pick_window",
    "scalars_to_digits",
]
