"""Device curve ops + NTT vs host oracles."""

import random

import numpy as np
import pytest

from snark_tpu.fields import BLS12_381, BLS12_381_FR, BN254, BN254_FR, Fp
from snark_tpu.ops.curve import get_g1_ops, get_g2_ops
from snark_tpu.ops.curve_host import host_g1, host_g2
from snark_tpu.ops.ntt import get_ntt_plan

CURVES = [BN254, BLS12_381]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generators_on_curve(curve):
    g1 = host_g1(curve)
    g2 = host_g2(curve)
    assert g1.is_on_curve(g1.generator)
    assert g2.is_on_curve(g2.generator)
    # generators have order r: [r]G = identity
    r = curve.fr.modulus
    assert g1.scalar_mul(g1.generator, r) is None
    assert g2.scalar_mul(g2.generator, r) is None


@pytest.mark.parametrize("curve", [BN254], ids=lambda c: c.name)
def test_device_g1_add_double(curve):
    ops = get_g1_ops(curve)
    hc = host_g1(curve)
    rng = random.Random(20)
    # points: k*G for a few k, plus identity
    ks = [1, 2, 3, 7, 1000, rng.getrandbits(100)]
    pts_host = [hc.scalar_mul(hc.generator, k) for k in ks] + [None]
    dev = ops.pack_affine_host(pts_host)
    # pairwise adds (incl. identity cases and doubling via equal operands)
    p = dev
    q = np.roll(np.asarray(p), 1, axis=0)
    got = ops.to_affine_host(ops.add(p, q))
    pts_rolled = pts_host[-1:] + pts_host[:-1]
    want = [hc.add(a, b) for a, b in zip(pts_host, pts_rolled)]
    assert got == want
    # explicit doubling (add of equal points exercises completeness)
    got_dbl = ops.to_affine_host(ops.add(dev, dev))
    want_dbl = [hc.double(pt) for pt in pts_host]
    assert got_dbl == want_dbl
    got_dbl2 = ops.to_affine_host(ops.double(dev))
    assert got_dbl2 == want_dbl
    # P + (-P) = identity
    neg = ops.neg_impl(dev)
    got_zero = ops.to_affine_host(ops.add(dev, neg))
    assert got_zero == [None] * len(pts_host)


@pytest.mark.parametrize("curve", [BN254], ids=lambda c: c.name)
def test_device_g1_scalar_mul(curve):
    ops = get_g1_ops(curve)
    hc = host_g1(curve)
    dev = ops.pack_affine_host([hc.generator])
    for k in (1, 2, 5, 123456789, 2**64 + 7):
        got = ops.to_affine_host(ops.scalar_mul_const(dev, k))
        assert got == [hc.scalar_mul(hc.generator, k)]


@pytest.mark.parametrize(
    "curve",
    [BN254, pytest.param(BLS12_381, marks=pytest.mark.slow)],
    ids=lambda c: getattr(c, "name", "bls12_381"),
)
def test_device_g2_add(curve):
    ops = get_g2_ops(curve)
    hc = host_g2(curve)
    ks = [1, 2, 5, 99]
    pts_host = [hc.scalar_mul(hc.generator, k) for k in ks] + [None]
    dev = ops.pack_affine_host(pts_host)
    got_dbl = ops.to_affine_host(ops.add(dev, dev))
    want_dbl = [hc.double(pt) for pt in pts_host]
    assert got_dbl == want_dbl
    q = np.roll(np.asarray(dev), 1, axis=0)
    got = ops.to_affine_host(ops.add(dev, q))
    pts_rolled = pts_host[-1:] + pts_host[:-1]
    want = [hc.add(a, b) for a, b in zip(pts_host, pts_rolled)]
    assert got == want


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR], ids=lambda p: p.name)
def test_ntt_roundtrip_and_reference(params):
    f = Fp(params)
    n = 64
    plan = get_ntt_plan(params, n)
    rng = random.Random(21)
    coeffs = [f.rand(rng) for _ in range(n)]
    dev = plan.df.array(coeffs)
    evals = plan.fft(dev)
    # reference: naive DFT out[i] = p(g^i), arkworks natural-order convention
    g = params.root_of_unity(n)
    p = params.modulus

    def poly_eval(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        return acc

    want = [poly_eval(pow(g, i, p)) for i in range(n)]
    got = plan.df.to_host_ints(evals)
    assert got == want
    # inverse round-trip
    back = plan.ifft(evals)
    assert plan.df.to_host_ints(back) == coeffs


def test_ntt_coset_roundtrip():
    params = BN254_FR
    f = Fp(params)
    n = 32
    plan = get_ntt_plan(params, n)
    rng = random.Random(22)
    coeffs = [f.rand(rng) for _ in range(n)]
    dev = plan.df.array(coeffs)
    ev = plan.coset_fft(dev)
    # coset evals: p(g_coset * omega^i)
    g = params.generator
    w = params.root_of_unity(n)
    p = params.modulus

    def poly_eval(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        return acc

    want = [poly_eval(g * pow(w, i, p) % p) for i in range(n)]
    assert plan.df.to_host_ints(ev) == want
    back = plan.coset_ifft(ev)
    assert plan.df.to_host_ints(back) == coeffs
