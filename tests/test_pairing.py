"""Pairing correctness: bilinearity, non-degeneracy, order-r image,
untwist-embedding sanity — for both BN254 and BLS12-381."""

import pytest

from snark_tpu.fields import BLS12_381, BN254
from snark_tpu.groth16.pairing import get_pairing
from snark_tpu.ops.curve_host import host_g1, host_g2

CURVES = [BN254, BLS12_381]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_untwist_lands_on_curve(curve):
    pr = get_pairing(curve)
    g2 = host_g2(curve)
    f = pr.fq12
    for k in (1, 2, 12345):
        X, Y = pr.untwist_g2(g2.scalar_mul(g2.generator, k))
        lhs = f.square(Y)
        rhs = f.add(f.mul(f.square(X), X), pr.embed_fq(curve.b))
        assert lhs == rhs


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_pairing_bilinear(curve):
    pr = get_pairing(curve)
    g1, g2 = host_g1(curve), host_g2(curve)
    P, Q = g1.generator, g2.generator
    e = pr.pairing(P, Q)
    assert not pr.fq12.is_one(e)
    assert pr.fq12.is_one(pr.fq12.pow(e, pr.r))  # image has order r
    a, b = 127, 991
    assert pr.pairing(g1.scalar_mul(P, a), g2.scalar_mul(Q, b)) == pr.fq12.pow(
        e, a * b
    )
    # e(aP, Q) * e(-aP, Q) = 1
    prod = pr.multi_pairing(
        [(g1.scalar_mul(P, a), Q), (g1.neg(g1.scalar_mul(P, a)), Q)]
    )
    assert pr.fq12.is_one(prod)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_pairing_identity_inputs(curve):
    pr = get_pairing(curve)
    g1, g2 = host_g1(curve), host_g2(curve)
    assert pr.fq12.is_one(pr.pairing(None, g2.generator))
    assert pr.fq12.is_one(pr.pairing(g1.generator, None))


def test_production_vs_generic_paths():
    """The twisted sparse-line Miller loop + Shamir final exponentiation
    must equal the generic untwisted/affine + square-and-multiply oracle
    on random inputs (VERDICT r1 item 9)."""
    import random

    from snark_tpu.fields import BLS12_381, BN254
    from snark_tpu.groth16.pairing import get_pairing
    from snark_tpu.ops.curve_host import host_g1, host_g2

    for curve in (BN254, BLS12_381):
        pe = get_pairing(curve)
        hg1, hg2 = host_g1(curve), host_g2(curve)
        rng = random.Random(17)
        for _ in range(2):
            P = hg1.scalar_mul(hg1.generator, rng.randrange(curve.fr.modulus))
            Q = hg2.scalar_mul(
                curve.g2_generator, rng.randrange(curve.fr.modulus)
            )
            assert pe.pairing(P, Q) == pe.pairing_generic(P, Q)
        # identity edge cases
        assert pe.pairing(None, Q) == pe.fq12.one
        assert pe.pairing(P, None) == pe.fq12.one
