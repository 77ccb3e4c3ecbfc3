"""Fused Pallas curve kernels + plane MSM (interpret mode).

Oracle: ops/curve_host (host mirror of ark-ec group law, SURVEY.md §2.3).
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from snark_tpu.fields import BN254, BLS12_381
from snark_tpu.fields.host import Fp
from snark_tpu.ops.curve_host import host_g1
from snark_tpu.ops.msm import scalars_to_digits
from snark_tpu.ops.msm_plane import get_plane_msm
from snark_tpu.ops.pallas_curve import (
    get_plane_curve,
    make_masked_add,
    make_point_add,
    make_point_double,
    pack_points_host,
    pack_rows_u8_host,
    unpack_points_host,
)


@pytest.mark.parametrize("curve", [BN254, BLS12_381], ids=lambda c: c.name)
def test_fused_add_double_complete(curve):
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    g = hc.generator
    p = curve.fq.modulus
    P = [hc.scalar_mul(g, k + 1) for k in range(6)]
    Q = [hc.scalar_mul(g, 7 * k + 3) for k in range(6)]
    # completeness cases: identity operands, P + (-P), P + P
    P += [None, P[0], P[1], None]
    Q += [P[2], (P[0][0], (-P[0][1]) % p), P[1], None]
    n = 128
    P += [g] * (n - len(P))
    Q += [g] * (n - len(Q))
    Xp, Yp, Zp = pack_points_host(pc, P)
    Xq, Yq, Zq = pack_points_host(pc, Q)
    add = make_point_add(curve, tile=128, interpret=True)
    got = unpack_points_host(pc, *add(Xp, Yp, Zp, Xq, Yq, Zq))
    assert got == [hc.add(a, b) for a, b in zip(P, Q)]
    dbl = make_point_double(curve, tile=128, interpret=True)
    got = unpack_points_host(pc, *dbl(Xp, Yp, Zp))
    assert got == [hc.double(a) for a in P]


def test_masked_add():
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    g = hc.generator
    n = 128
    P = [hc.scalar_mul(g, k + 1) for k in range(n)]
    Q = [hc.scalar_mul(g, 3 * k + 2) for k in range(n)]
    mask = np.asarray([k % 3 == 0 for k in range(n)])
    madd = make_masked_add(curve, tile=128, interpret=True)
    got = unpack_points_host(
        pc,
        *madd(
            *pack_points_host(pc, P),
            *pack_points_host(pc, Q),
            jnp.asarray(mask[None, :].astype(np.float32)),
        ),
    )
    expect = [hc.add(a, b) if m else a for a, b, m in zip(P, Q, mask)]
    assert got == expect


@pytest.mark.parametrize("c", [8, 10])
def test_plane_msm(c):
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(5)
    n = 512
    pts = [
        hc.scalar_mul(hc.generator, rng.randrange(1, curve.fr.modulus))
        for _ in range(30)
    ] + [None, None]
    pts = pts * (n // 32)
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    # edge scalars: 0, 1, r-1
    scalars[:3] = [0, 1, curve.fr.modulus - 1]
    table = jnp.asarray(pack_rows_u8_host(pc, pts))
    digits = scalars_to_digits(fr.to_limbs_array(scalars), c, curve.fr.num_bits)
    plan = get_plane_msm(curve, c, interpret=True)
    exp = None
    for s, pt in zip(scalars, pts):
        if pt is not None:
            exp = hc.add(exp, hc.scalar_mul(pt, s))
    assert plan.msm_host(table, digits, hc) == exp
    X, Y, Z = plan.msm(table, digits)
    got = unpack_points_host(pc, np.asarray(X), np.asarray(Y), np.asarray(Z))[0]
    assert got == exp


@pytest.mark.parametrize("c", [8, 11])
def test_plane_msm_signed(c):
    """Signed (balanced) digits: half the bucket slots, 2N-row table with
    negated points in the upper half; weights shift to b+1 via keeping S_0
    in the second suffix scan."""
    from snark_tpu.ops.msm import scalars_to_digits_signed
    from snark_tpu.ops.pallas_curve import pack_rows_u8_signed_host

    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(9)
    n = 512
    pts = [
        hc.scalar_mul(hc.generator, rng.randrange(1, curve.fr.modulus))
        for _ in range(30)
    ] + [None, None]
    pts = pts * (n // 32)
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    # edge scalars: 0, 1, r-1, all-windows-at-half (stress the balance rule)
    half_pat = sum((1 << (c - 1)) << (c * w) for w in range(curve.fr.num_bits // c))
    scalars[:4] = [0, 1, curve.fr.modulus - 1, half_pat % curve.fr.modulus]
    table = jnp.asarray(pack_rows_u8_signed_host(pc, pts))
    digits = scalars_to_digits_signed(
        fr.to_limbs_array(scalars), c, curve.fr.num_bits
    )
    assert int(np.abs(digits).max()) <= 1 << (c - 1)
    plan = get_plane_msm(curve, c, interpret=True, signed=True)
    exp = None
    for s, pt in zip(scalars, pts):
        if pt is not None:
            exp = hc.add(exp, hc.scalar_mul(pt, s))
    assert plan.msm_host(table, digits, hc) == exp
    X, Y, Z = plan.msm(table, digits)
    got = unpack_points_host(pc, np.asarray(X), np.asarray(Y), np.asarray(Z))[0]
    assert got == exp
