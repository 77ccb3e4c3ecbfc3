"""Host field layer tests: parameters, arithmetic laws, tower sanity.

Oracles: algebraic identities + independently-known constants for BN254 /
BLS12-381 (the arkworks convention constants are derived, so these tests pin
the conventions: generator choice, two-adicity, root-of-unity ordering).
"""

import random

import pytest

from snark_tpu.fields import (
    BN254,
    BN254_FR,
    BN254_FQ,
    BLS12_381,
    BLS12_381_FR,
    BLS12_381_FQ,
    Fp,
    make_tower,
)

# Known factorizations of p-1 (public number theory; used to certify that the
# configured multiplicative generators really generate F_p^*).
BN254_FR_MINUS1_FACTORS = [
    2, 3, 13, 29, 983, 11003, 237073, 405928799, 1670836401704629,
    13818364434197438864469338081,
]
BLS12_381_FR_MINUS1_FACTORS = [
    2, 3, 11, 19, 10177, 125527, 859267, 906349, 2508409, 2529403,
    52437899, 254760293,
]


@pytest.mark.parametrize(
    "params,factors,expected_adicity",
    [
        (BN254_FR, BN254_FR_MINUS1_FACTORS, 28),
        (BLS12_381_FR, BLS12_381_FR_MINUS1_FACTORS, 32),
    ],
)
def test_generator_is_primitive(params, factors, expected_adicity):
    p = params.modulus
    assert params.two_adicity == expected_adicity
    # each listed prime divides p-1, and generator^((p-1)/q) != 1
    for q in set(factors):
        assert (p - 1) % q == 0
        assert pow(params.generator, (p - 1) // q, p) != 1


def test_two_adic_root_order():
    for params in (BN254_FR, BLS12_381_FR):
        w = params.two_adic_root_of_unity
        p = params.modulus
        assert pow(w, 1 << params.two_adicity, p) == 1
        assert pow(w, 1 << (params.two_adicity - 1), p) == p - 1  # exact order


def test_known_roots_of_unity():
    # omega for 2^28 domain over BN254 Fr: must satisfy order exactly 2^28,
    # and the size-2 domain root is -1 for any field.
    assert BN254_FR.root_of_unity(2) == BN254_FR.modulus - 1
    assert BLS12_381_FR.root_of_unity(2) == BLS12_381_FR.modulus - 1
    w8 = BLS12_381_FR.root_of_unity(8)
    assert pow(w8, 8, BLS12_381_FR.modulus) == 1
    assert pow(w8, 4, BLS12_381_FR.modulus) == BLS12_381_FR.modulus - 1


def test_montgomery_constants():
    for params in (BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ):
        p, r, np_ = params.modulus, params.r, params.n_prime
        assert r > p
        assert (p * np_) % r == r - 1  # -p^-1 * p = -1 mod R
        assert params.r2 == r * r % p


def test_field_ops_laws():
    rng = random.Random(0)
    for params in (BN254_FR, BLS12_381_FQ):
        f = Fp(params)
        for _ in range(50):
            a, b, c = f.rand(rng), f.rand(rng), f.rand(rng)
            assert f.add(a, b) == f.add(b, a)
            assert f.mul(a, f.add(b, c)) == f.add(f.mul(a, b), f.mul(a, c))
            assert f.sub(a, a) == 0
            assert f.add(a, f.neg(a)) == 0
            if a:
                assert f.mul(a, f.inv(a)) == 1
            assert f.square(a) == f.mul(a, a)
            assert f.double(a) == f.add(a, a)


def test_sqrt():
    rng = random.Random(1)
    for params in (BN254_FR, BLS12_381_FR, BLS12_381_FQ):
        f = Fp(params)
        for _ in range(10):
            a = f.rand(rng)
            sq = f.square(a)
            r = f.sqrt(sq)
            assert r is not None and f.square(r) == sq


def test_limb_roundtrip():
    rng = random.Random(2)
    for params in (BN254_FR, BLS12_381_FQ):
        f = Fp(params)
        xs = [f.rand(rng) for _ in range(17)] + [0, 1, params.modulus - 1]
        arr = f.to_limbs_array(xs)
        assert arr.shape == (len(xs), params.num_limbs)
        assert f.from_limbs_array(arr) == xs
        mont = f.to_mont_limbs_array(xs)
        assert f.from_mont_limbs_array(mont) == xs


def test_tower_fq2_laws():
    for curve in (BN254, BLS12_381):
        fq2, fq6, fq12 = make_tower(curve)
        rng = random.Random(3)
        p = curve.fq.modulus
        for _ in range(20):
            a = (rng.randrange(p), rng.randrange(p))
            b = (rng.randrange(p), rng.randrange(p))
            assert fq2.mul(a, b) == fq2.mul(b, a)
            assert fq2.square(a) == fq2.mul(a, a)
            if not fq2.is_zero(a):
                assert fq2.mul(a, fq2.inv(a)) == fq2.one
            # frobenius is the p-power map
            assert fq2.frobenius(a) == fq2.pow(a, p)


def test_tower_fq6_fq12_laws():
    for curve in (BN254, BLS12_381):
        fq2, fq6, fq12 = make_tower(curve)
        rng = random.Random(4)
        p = curve.fq.modulus

        def r2():
            return (rng.randrange(p), rng.randrange(p))

        a6 = (r2(), r2(), r2())
        b6 = (r2(), r2(), r2())
        assert fq6.mul(a6, b6) == fq6.mul(b6, a6)
        assert fq6.mul(a6, fq6.inv(a6)) == fq6.one
        assert fq6.mul(fq6.mul_by_v(fq6.one), a6) == fq6.mul_by_v(a6)

        a12 = (a6, b6)
        b12 = (b6, a6)
        assert fq12.mul(a12, b12) == fq12.mul(b12, a12)
        assert fq12.mul(a12, fq12.inv(a12)) == fq12.one
        assert fq12.square(a12) == fq12.mul(a12, a12)
        # Frobenius vs pow(p) (slow but definitive)
        assert fq12.frobenius(a12) == fq12.pow(a12, p)


def test_fq6_frobenius_powers():
    for curve in (BN254, BLS12_381):
        fq2, fq6, _ = make_tower(curve)
        rng = random.Random(5)
        p = curve.fq.modulus

        def r2():
            return (rng.randrange(p), rng.randrange(p))

        a6 = (r2(), r2(), r2())
        # frobenius(k) = frobenius applied k times
        fr1 = fq6.frobenius(a6, 1)
        fr2 = fq6.frobenius(a6, 2)
        assert fq6.frobenius(fr1, 1) == fr2
