"""Batch-affine bucket accumulation (ops/msm_affine.py), emu path.

Oracle: ops/curve_host (host mirror of ark-ec's group law, SURVEY.md
§2.3 "ark-ec / VariableBaseMSM"). Inputs are built to hit every
degenerate pair the affine tree must handle exactly: identity rows,
duplicated bases (P + P doubling at tree levels), P + (−P) inverse
pairs collapsing to identity, clustered scalars (monster buckets →
block-scan spill), empty buckets, and the signed-digit in-row negation.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from snark_tpu.fields import BN254, BLS12_381
from snark_tpu.fields.host import Fp
from snark_tpu.ops.curve_host import host_g1, host_g2
from snark_tpu.ops.msm import scalars_to_digits, scalars_to_digits_signed
from snark_tpu.ops.msm_plane import get_plane_msm
from snark_tpu.ops.pallas_curve import (
    get_plane_curve,
    pack_rows_u8_host,
)


def _host_msm(hc, pts, scalars, r):
    exp = None
    for s, pt in zip(scalars, pts):
        if pt is not None:
            exp = hc.add(exp, hc.scalar_mul(pt, s % r))
    return exp


def _check(curve, group, c, n, signed, pts, scalars, k_steps=1):
    import os

    os.environ["SNARK_TPU_MSM_AFFINE"] = "1"  # default is off (see plan)
    pc = get_plane_curve(curve)
    hc = host_g1(curve) if group == "g1" else host_g2(curve)
    fr = Fp(curve.fr)
    table = jnp.asarray(pack_rows_u8_host(pc, pts, group))
    to_digits = scalars_to_digits_signed if signed else scalars_to_digits
    digits = to_digits(fr.to_limbs_array(scalars), c, curve.fr.num_bits)
    plan = get_plane_msm(
        curve, c, interpret=True, group=group, signed=signed, k_steps=k_steps
    )
    assert plan.use_affine and n >= (8 << plan.cb), (
        "test shape must exercise the affine path"
    )
    got = plan.msm_host(table, digits, hc)
    assert plan._affine is not None, "affine accumulator was not engaged"
    exp = _host_msm(hc, pts, scalars, curve.fr.modulus)
    assert got == exp


def _pool(hc, rng, r, k):
    return [hc.scalar_mul(hc.generator, rng.randrange(1, r)) for _ in range(k)]


def test_affine_msm_unsigned_degenerates():
    curve = BN254
    hc = host_g1(curve)
    rng = random.Random(11)
    r = curve.fr.modulus
    n, c = 4096, 8  # mean bucket length 16 -> affine path, B0 = 4
    # heavy duplication (doubling at every tree level) + identity rows
    pts = (_pool(hc, rng, r, 14) + [None, None]) * (n // 16)
    scalars = [rng.randrange(0, r) for _ in range(n)]
    # edges + clustering: one shared scalar on an eighth of the points
    # (every window's same bucket -> monster buckets -> block spill)
    scalars[:3] = [0, 1, r - 1]
    clustered = rng.randrange(0, r)
    for i in range(0, n, 8):
        scalars[i] = clustered
    _check(curve, "g1", c, n, False, pts, scalars)


def test_affine_msm_signed_inverse_pairs():
    curve = BN254
    hc = host_g1(curve)
    p = curve.fq.modulus
    rng = random.Random(13)
    r = curve.fr.modulus
    n, c = 4096, 9  # signed: cb = 8, mean 16
    base = _pool(hc, rng, r, 8)
    negs = [(pt[0], (p - pt[1]) % p) for pt in base]
    # P and -P interleaved; equal scalars put each (P, -P) pair in the
    # same bucket of every window -> inverse case (identity) everywhere
    pts = []
    for i in range(n // 16):
        pts += base + negs
    scalars = [rng.randrange(0, r) for _ in range(n)]
    shared = rng.randrange(1, r)
    for i in range(0, n // 2, 16):
        for j in range(16):
            scalars[i * 2 + j] = shared
    scalars[:4] = [0, 1, r - 1, shared]
    _check(curve, "g1", c, n, True, pts, scalars)


def test_affine_msm_signed_k_steps():
    """k_steps > 1 block scan composes with the affine tree output."""
    curve = BN254
    hc = host_g1(curve)
    rng = random.Random(17)
    r = curve.fr.modulus
    n, c = 4096, 9
    pts = (_pool(hc, rng, r, 30) + [None, None]) * (n // 32)
    scalars = [rng.randrange(0, r) for _ in range(n)]
    _check(curve, "g1", c, n, True, pts, scalars, k_steps=2)


def test_affine_msm_bls12_381():
    curve = BLS12_381
    hc = host_g1(curve)
    rng = random.Random(19)
    r = curve.fr.modulus
    n, c = 2048, 8  # mean 8 (gate boundary), B0 = 4
    pts = (_pool(hc, rng, r, 15) + [None]) * (n // 16)
    scalars = [rng.randrange(0, r) for _ in range(n)]
    scalars[:3] = [0, 1, r - 1]
    _check(curve, "g1", c, n, False, pts, scalars)


def test_affine_g2_falls_back_on_cpu():
    """G2 affine is TPU-only: XLA:CPU segfaults compiling the emu form
    of the G2 phase kernels (deterministic, fresh-process repro). On the
    CPU suite the G2 plan must run the projective scan; the real-TPU G2
    affine path is checked by scripts/bench_affine_msm.py (G2 section).
    """
    import os

    os.environ["SNARK_TPU_MSM_AFFINE"] = "1"
    plan = get_plane_msm(BN254, 8, interpret=True, group="g2", signed=False)
    assert not plan.use_affine

    curve = BN254
    hc = host_g2(curve)
    rng = random.Random(23)
    r = curve.fr.modulus
    n, c = 2048, 8
    pts = (_pool(hc, rng, r, 7) + [None]) * (n // 8)
    scalars = [rng.randrange(0, r) for _ in range(n)]
    scalars[:2] = [0, r - 1]
    # projective fallback still correct at this shape
    from snark_tpu.fields.host import Fp

    pc = get_plane_curve(curve)
    fr = Fp(curve.fr)
    table = jnp.asarray(pack_rows_u8_host(pc, pts, "g2"))
    digits = scalars_to_digits(
        fr.to_limbs_array(scalars), c, curve.fr.num_bits
    )
    assert plan.msm_host(table, digits, hc) == _host_msm(
        hc, pts, scalars, r
    )
