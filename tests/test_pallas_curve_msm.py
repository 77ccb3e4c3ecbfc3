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


@pytest.mark.parametrize(
    "c,k_steps",
    [(8, 1), (8, 2), (10, 3)],
    ids=["c8-k1", "c8-k2", "c10-k3"],
)
def test_plane_msm(c, k_steps):
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
    # k_steps > 1 exercises the batched (lanes, KS) gather + per-step
    # in-kernel masking, including the tail where max_len is not a
    # multiple of KS (ADVICE r2: the default k=1 left it uncovered)
    plan = get_plane_msm(curve, c, interpret=True, k_steps=k_steps)
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
    """Signed (balanced) digits: half the bucket slots; digit signs ride
    the payload high bit and the kernel negates the gathered Y in-kernel
    (the table stays N positive rows); weights shift to b+1 via keeping
    S_0 in the second suffix scan."""
    from snark_tpu.ops.msm import scalars_to_digits_signed

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
    table = jnp.asarray(pack_rows_u8_host(pc, pts))
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


def test_g2_cmul_b3_vpu_branch():
    """The _G2Field.cmul_b3 scalar-conv (mb3=None) branch is never
    selected by the built kernels (they always pass the MXU bands) —
    cover it directly against the MXU branch and the host oracle
    (ADVICE r2). Also exercises its tighter digit bound (two convs share
    one scratch: |x| <= ~950, see the docstring)."""
    import jax.numpy as jnp

    from snark_tpu.fields.host import Fp
    from snark_tpu.fields.towers import Fq2
    from snark_tpu.ops.pallas_curve import _G2Field, get_plane_curve
    from snark_tpu.ops.pallas_field_v3 import BF16, F32

    curve = BN254
    pc = get_plane_curve(curve)
    pf = pc.pf
    p = curve.fq.modulus
    fq2 = Fq2(p)
    rng = random.Random(21)
    n = 8
    xs = [(rng.randrange(0, p), rng.randrange(0, p)) for _ in range(n)]

    X = jnp.asarray(
        np.concatenate(
            [pf.pack_np([x[0] for x in xs]), pf.pack_np([x[1] for x in xs])],
            axis=0,
        )
    )
    cols = jnp.asarray(pc.COLS)

    class Ref:
        def __init__(self, shape):
            self.a = np.zeros(shape, np.float32)
            self.shape = shape

        def __getitem__(self, k):
            # copy, NOT asarray: on CPU jnp.asarray can zero-copy-alias the
            # numpy buffer, and the later in-place __setitem__ then races
            # the async consumers of this read (load-dependent flake)
            return jnp.array(self.a[k])

        def __setitem__(self, k, v):
            self.a[k] = np.asarray(v)

    def run(mb3):
        t_ref = Ref((2 * pf.R8, n))
        F = _G2Field(pf, t_ref, pc.B3_DIGITS_G2, cols, mb3=mb3)
        out = F.cmul_b3(X)
        o = np.asarray(out)
        return (
            pf.unpack_np(o[: pf.R8]),
            pf.unpack_np(o[pf.R8 :]),
        )

    got_vpu = run(None)
    mb3 = tuple(jnp.asarray(m).astype(BF16) for m in pc.M_B3_G2)
    got_mxu = run(mb3)
    b3 = tuple(3 * v % p for v in curve.b2)
    expect = [fq2.mul(x, b3) for x in xs]
    for comp in (0, 1):
        assert got_vpu[comp] == [e[comp] for e in expect]
        assert got_mxu[comp] == [e[comp] for e in expect]


def test_plane_msm_signed_clustered_spill():
    """Skewed scalar distributions (here: half ~44-bit values, the real
    witness pattern that puts ~5% of N into single boundary-window
    buckets) must stay correct through the rank-split spill path — each
    spilled bucket's overflow is divided over ksp spill lanes and folded
    back (msm_plane._bucket_accum_impl)."""
    from snark_tpu.ops.msm import scalars_to_digits_signed

    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(23)
    n = 2048
    pts = [
        hc.scalar_mul(hc.generator, rng.randrange(1, curve.fr.modulus))
        for _ in range(32)
    ] * (n // 32)
    scalars = [
        rng.randrange(1 << 44) if i % 2 else rng.randrange(curve.fr.modulus)
        for i in range(n)
    ]
    table = jnp.asarray(pack_rows_u8_host(pc, pts))
    digits = scalars_to_digits_signed(
        fr.to_limbs_array(scalars), 11, curve.fr.num_bits
    )
    plan = get_plane_msm(curve, 11, interpret=True, signed=True)
    assert plan.spill_lanes > 0  # the path under test is active
    exp = None
    for s, pt in zip(scalars, pts):
        exp = hc.add(exp, hc.scalar_mul(pt, s))
    assert plan.msm_host(table, digits, hc) == exp
