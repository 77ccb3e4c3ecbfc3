"""f32-digit device field vs the host mirror — same oracle battery as the
uint32 path (this is the fast path used by the curve/NTT/MSM kernels)."""

import random

import jax
import numpy as np
import pytest

from snark_tpu.fields import BLS12_381_FQ, BLS12_381_FR, BN254_FR, Fp
from snark_tpu.fields.device_f32 import get_device_field_f32

PARAMS = [BN254_FR, BLS12_381_FR, BLS12_381_FQ]


def rand_batch(f: Fp, n: int, rng) -> list[int]:
    special = [0, 1, f.p - 1, f.p - 2, (f.p - 1) // 2, f.params.r % f.p]
    out = special[: min(len(special), n)]
    while len(out) < n:
        out.append(f.rand(rng))
    return out


def from_digits(df, f, arr) -> list[int]:
    limbs = df.digits_to_limbs_np(np.asarray(arr))
    return f.from_limbs_array(limbs)


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_f32_add_sub_neg(params):
    f = Fp(params)
    df = get_device_field_f32(params)
    rng = random.Random(50)
    n = 32
    xs, ys = rand_batch(f, n, rng), rand_batch(f, n, rng)
    a = df.array(xs, mont=False)
    b = df.array(ys, mont=False)
    assert from_digits(df, f, df.add(a, b)) == [f.add(x, y) for x, y in zip(xs, ys)]
    assert from_digits(df, f, df.sub(a, b)) == [f.sub(x, y) for x, y in zip(xs, ys)]
    assert from_digits(df, f, df.neg(a)) == [f.neg(x) for x in xs]
    assert from_digits(df, f, df.double(a)) == [f.double(x) for x in xs]


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_f32_mont_mul(params):
    f = Fp(params)
    df = get_device_field_f32(params)
    rng = random.Random(51)
    n = 32
    xs, ys = rand_batch(f, n, rng), rand_batch(f, n, rng)
    a, b = df.array(xs), df.array(ys)
    got = from_digits(df, f, df.mul(a, b))  # = mont(x*y) = x*y*R mod p
    got_plain = [v * pow(params.r, -1, f.p) % f.p for v in got]
    assert got_plain == [f.mul(x, y) for x, y in zip(xs, ys)]
    got_sq = from_digits(df, f, df.square(a))
    assert [v * pow(params.r, -1, f.p) % f.p for v in got_sq] == [
        f.square(x) for x in xs
    ]


def test_f32_sub_borrow_ripple():
    """The case that breaks naive signed sweeps: b slightly larger than a in
    the low digits with long zero runs above."""
    params = BN254_FR
    f = Fp(params)
    df = get_device_field_f32(params)
    cases = [
        (0, 1),
        (1, 2),
        (1 << 128, (1 << 128) + 1),
        (1 << 255 if (1 << 255) < f.p else f.p - 1, 1),
        (256, 257),
    ]
    xs = [a % f.p for a, _ in cases]
    ys = [b % f.p for _, b in cases]
    a = df.array(xs, mont=False)
    b = df.array(ys, mont=False)
    assert from_digits(df, f, df.sub(a, b)) == [
        f.sub(x, y) for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("params", [BN254_FR], ids=lambda p: p.name)
def test_f32_inv_pow(params):
    f = Fp(params)
    df = get_device_field_f32(params)
    rng = random.Random(52)
    xs = [f.rand(rng) for _ in range(8)] + [1, f.p - 1]
    a = df.array(xs)
    got = from_digits(df, f, df.inv(a))
    rinv = pow(params.r, -1, f.p)
    assert [v * rinv % f.p for v in got] == [f.inv(x) for x in xs]
    p5 = from_digits(df, f, df.pow_const(a, 5))
    assert [v * rinv % f.p for v in p5] == [f.pow(x, 5) for x in xs]


def test_f32_roundtrip_and_predicates():
    params = BN254_FR
    f = Fp(params)
    df = get_device_field_f32(params)
    rng = random.Random(53)
    xs = rand_batch(f, 16, rng)
    std = df.array(xs, mont=False)
    back = from_digits(df, f, df.from_mont(df.to_mont(std)))
    assert back == xs
    a = df.array([0, 5, 0, 7], mont=False)
    b = df.array([0, 5, 1, 6], mont=False)
    assert list(np.asarray(df.is_zero(a))) == [True, False, True, False]
    assert list(np.asarray(df.eq(a, b))) == [True, True, False, False]
