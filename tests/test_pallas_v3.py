"""pallas_field_v3: bit-exactness + lazy-composition invariants (interpret).

Oracle: host Fp (mirrors ark-ff Montgomery semantics; SURVEY.md §2.3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from snark_tpu.fields import BLS12_381, BN254
from snark_tpu.fields.host import Fp
from snark_tpu.ops.pallas_field_v3 import (
    BF16,
    F32,
    get_plane_field_v3,
    make_mont_mul_v3,
    sweep3,
)

FIELDS = {
    "bn254.fr": BN254.fr,
    "bn254.fq": BN254.fq,
    "bls12_381.fr": BLS12_381.fr,
    "bls12_381.fq": BLS12_381.fq,
}


def rand_vals(params, n, seed=0):
    rng = np.random.RandomState(seed)
    return [
        int.from_bytes(rng.bytes(64), "little") % params.modulus
        for _ in range(n)
    ]


def to_planes(params, vals):
    f = Fp(params)
    pf = get_plane_field_v3(params)
    limbs = f.to_mont_limbs_array(vals)
    lo = (limbs & 0xFF).astype(np.float32)
    hi = ((limbs >> 8) & 0xFF).astype(np.float32)
    inter = np.stack([lo, hi], axis=-1).reshape(limbs.shape[0], pf.R8)
    return jnp.asarray(inter.T)  # (R8, N)


def planes_to_vals(params, planes, mont=True):
    d = np.asarray(planes, dtype=np.int64)  # (R8, N)
    vals = []
    rinv = pow(params.r, -1, params.modulus)
    for col in d.T:
        v = int(sum(int(x) << (8 * i) for i, x in enumerate(col)))
        if mont:
            v = v * rinv
        vals.append(v % params.modulus)
    return vals


@pytest.mark.parametrize("name", list(FIELDS))
def test_mont_mul_v3_bit_exact(name):
    params = FIELDS[name]
    f = Fp(params)
    n = 128
    av, bv = rand_vals(params, n, 1), rand_vals(params, n, 2)
    a = jnp.asarray(f.to_mont_limbs_array(av))
    b = jnp.asarray(f.to_mont_limbs_array(bv))
    mm = make_mont_mul_v3(params, tile=128, interpret=True)
    out = np.asarray(mm(a, b))
    expect = f.to_mont_limbs_array([x * y % params.modulus for x, y in zip(av, bv)])
    assert np.array_equal(out, expect)


def test_mont_mul_v3_edge_values():
    params = BN254.fr
    f = Fp(params)
    p = params.modulus
    av = [0, 1, p - 1, p - 1, 1, 2**255 % p, (p - 1) // 2]
    bv = [5, 1, p - 1, 1, p - 1, 2**255 % p, 2]
    av += [0] * (128 - len(av))
    bv += [0] * (128 - len(bv))
    a = jnp.asarray(f.to_mont_limbs_array(av))
    b = jnp.asarray(f.to_mont_limbs_array(bv))
    mm = make_mont_mul_v3(params, tile=128, interpret=True)
    out = np.asarray(mm(a, b))
    expect = f.to_mont_limbs_array([x * y % p for x, y in zip(av, bv)])
    assert np.array_equal(out, expect)


def test_lazy_composition_chain():
    """mul -> add -> sub -> mul chains stay exact under the documented
    digit/value invariants (module docstring of pallas_field_v3)."""
    params = BN254.fr
    p = params.modulus
    pf = get_plane_field_v3(params)
    n = 64
    av, bv, cv = (rand_vals(params, n, s) for s in (3, 4, 5))
    A, B, C = (to_planes(params, v) for v in (av, bv, cv))
    cs = jnp.asarray(pf.CARRY_SCALE)
    p2 = jnp.asarray(pf.P2_COL)

    class FakeRef:
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

    t_ref = FakeRef((2 * pf.R8, n))
    # x = a*b (lazy out, digits <= 256, value <= 1.4p)
    x = pf.mont_mul(A, B, t_ref, cs)
    # y = x + c (digits <= 512, value <= 2.4p): legal mul input
    y = pf.add(x, C)
    # z = y - b + 2p (digits in (-256, 768+)... keep sub on canonical-ish)
    z = pf.sub(y, B, p2)
    z = sweep3(z)  # re-bound digits before multiplying
    # w = z * a
    w = pf.mont_mul(z, A, t_ref, cs)
    got = planes_to_vals(params, w)
    # planes hold mont forms: x=abR, y=(ab+c)R, z≡(ab+c-b)R, w≡(ab+c-b)aR;
    # planes_to_vals strips the R factor.
    expect = [((a * b + c - b) * a) % p for a, b, c in zip(av, bv, cv)]
    assert got == expect


def test_sweep3_bounds():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randint(0, 2**23, size=(32, 64)).astype(np.float32))
    out = np.asarray(sweep3(z))
    assert out.max() <= 256
    assert out.min() >= 0
    # value preserved mod 256^32 (top carry dropped)
    v_in = sum(int(x) << (8 * i) for i, x in enumerate(np.asarray(z, np.int64)[:, 0]))
    v_out = sum(int(x) << (8 * i) for i, x in enumerate(out[:, 0].astype(np.int64)))
    assert v_in % (256**32) == v_out % (256**32)
