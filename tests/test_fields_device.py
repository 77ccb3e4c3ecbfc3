"""Device field kernels vs the host mirror (bit-exactness oracle).

Every device op is checked elementwise against pure-Python big-int arithmetic
over random batches, including worst-case carry patterns.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_tpu.fields import BLS12_381_FQ, BLS12_381_FR, BN254_FR, Fp
from snark_tpu.fields.device import DeviceField, get_device_field

PARAMS = [BN254_FR, BLS12_381_FR, BLS12_381_FQ]


def rand_batch(f: Fp, n: int, rng) -> list[int]:
    special = [0, 1, f.p - 1, f.p - 2, (f.p - 1) // 2, f.params.r % f.p]
    out = special[: min(len(special), n)]
    while len(out) < n:
        out.append(f.rand(rng))
    return out


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_device_add_sub_neg(params):
    f = Fp(params)
    df = get_device_field(params)
    rng = random.Random(10)
    n = 32
    xs, ys = rand_batch(f, n, rng), rand_batch(f, n, rng)
    a = df.array(xs, mont=False)
    b = df.array(ys, mont=False)
    # add/sub/neg are Montgomery-form agnostic (linear ops)
    got_add = f.from_limbs_array(np.asarray(df.add(a, b)))
    assert got_add == [f.add(x, y) for x, y in zip(xs, ys)]
    got_sub = f.from_limbs_array(np.asarray(df.sub(a, b)))
    assert got_sub == [f.sub(x, y) for x, y in zip(xs, ys)]
    got_neg = f.from_limbs_array(np.asarray(df.neg(a)))
    assert got_neg == [f.neg(x) for x in xs]
    got_dbl = f.from_limbs_array(np.asarray(df.double(a)))
    assert got_dbl == [f.double(x) for x in xs]


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_device_mont_mul(params):
    f = Fp(params)
    df = get_device_field(params)
    rng = random.Random(11)
    n = 32
    xs, ys = rand_batch(f, n, rng), rand_batch(f, n, rng)
    a = df.array(xs)  # mont form
    b = df.array(ys)
    got = f.from_mont_limbs_array(np.asarray(df.mul(a, b)))
    assert got == [f.mul(x, y) for x, y in zip(xs, ys)]
    got_sq = f.from_mont_limbs_array(np.asarray(df.square(a)))
    assert got_sq == [f.square(x) for x in xs]


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_device_mont_roundtrip(params):
    f = Fp(params)
    df = get_device_field(params)
    rng = random.Random(12)
    xs = rand_batch(f, 16, rng)
    std = df.array(xs, mont=False)
    mont = df.to_mont(std)
    back = df.from_mont(mont)
    assert f.from_limbs_array(np.asarray(back)) == xs


def test_device_carry_worst_case():
    """Force long carry ripples (digits of 0xFFFF)."""
    params = BN254_FR
    f = Fp(params)
    df = get_device_field(params)
    # values with long runs of 0xFFFF limbs
    v1 = (1 << 240) - 1  # 15 limbs of 0xFFFF
    v2 = 1
    a = df.array([v1, v1, f.p - 1], mont=False)
    b = df.array([v2, v1, f.p - 1], mont=False)
    got = f.from_limbs_array(np.asarray(df.add(a, b)))
    assert got == [f.add(v1, v2), f.add(v1, v1), f.add(f.p - 1, f.p - 1)]
    got = f.from_limbs_array(np.asarray(df.sub(b, a)))
    assert got == [f.sub(v2, v1), 0, 0]


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FQ], ids=lambda p: p.name)
def test_device_inv_pow(params):
    f = Fp(params)
    df = get_device_field(params)
    rng = random.Random(13)
    xs = [f.rand(rng) for _ in range(8)] + [1, f.p - 1]
    a = df.array(xs)
    inv = df.inv(a)
    got = f.from_mont_limbs_array(np.asarray(inv))
    assert got == [f.inv(x) for x in xs]
    # pow with a small exponent
    p5 = df.pow_const(a, 5)
    assert f.from_mont_limbs_array(np.asarray(p5)) == [f.pow(x, 5) for x in xs]


def test_device_predicates():
    params = BN254_FR
    f = Fp(params)
    df = get_device_field(params)
    a = df.array([0, 5, 0, 7], mont=False)
    b = df.array([0, 5, 1, 6], mont=False)
    assert list(np.asarray(df.is_zero(a))) == [True, False, True, False]
    assert list(np.asarray(df.eq(a, b))) == [True, True, False, False]
    sel = df.select(df.eq(a, b), a, b)
    assert f.from_limbs_array(np.asarray(sel)) == [0, 5, 1, 6]


def test_device_ops_jit_and_vmap():
    params = BN254_FR
    f = Fp(params)
    df = get_device_field(params)
    rng = random.Random(14)
    xs, ys = rand_batch(f, 8, rng), rand_batch(f, 8, rng)
    a, b = df.array(xs), df.array(ys)

    @jax.jit
    def fused(a, b):
        return df.add(df.mul(a, b), df.square(a))

    got = f.from_mont_limbs_array(np.asarray(fused(a, b)))
    want = [f.add(f.mul(x, y), f.square(x)) for x, y in zip(xs, ys)]
    assert got == want

    vm = jax.vmap(df.mul)(a.reshape(2, 4, -1), b.reshape(2, 4, -1))
    got2 = f.from_mont_limbs_array(np.asarray(vm).reshape(8, -1))
    assert got2 == [f.mul(x, y) for x, y in zip(xs, ys)]
