"""Plane NTT (fused Pallas butterflies): bit-exactness vs host oracle.

Root conventions mirror ark-poly Radix2EvaluationDomain (SURVEY.md §2.3):
natural-order evaluations out[i] = p(g^i) with g = 2-adic root^(2^(s-log n)).
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from snark_tpu.fields import BLS12_381, BN254
from snark_tpu.ops.ntt_plane import get_plane_ntt


def host_ntt(coeffs, w, p):
    n = len(coeffs)
    return [
        sum(c * pow(w, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize(
    "params", [BN254.fr, BLS12_381.fr], ids=["bn254.fr", "bls12_381.fr"]
)
def test_plane_fft_ifft(params):
    p = params.modulus
    n = 64
    rng = random.Random(2)
    vals = [rng.randrange(0, p) for _ in range(n)]
    pn = get_plane_ntt(params, n, interpret=True)
    pf = pn.pf
    x = jnp.asarray(pf.pack_np(vals))
    omega = params.root_of_unity(n)
    assert pf.unpack_np(np.asarray(pn.fft(x))) == host_ntt(vals, omega, p)
    back = pf.unpack_np(np.asarray(pn.ifft(pn.fft(x))))
    assert back == [v % p for v in vals]


def test_plane_h_pipeline_and_tostd():
    params = BN254.fr
    p = params.modulus
    n = 64
    rng = random.Random(3)
    pn = get_plane_ntt(params, n, interpret=True)
    pf = pn.pf
    omega = params.root_of_unity(n)
    g = params.generator

    av, bv, cv = (
        [rng.randrange(0, p) for _ in range(n)] for _ in range(3)
    )
    A, B, C = (jnp.asarray(pf.pack_np(v)) for v in (av, bv, cv))
    h_bitrev = pn.h_from_evals(A, B, C)

    def host_intt(evals, w):
        n_inv = pow(n, -1, p)
        return [c * n_inv % p for c in host_ntt(evals, pow(w, -1, p), p)]

    def coset_eval(coeffs):
        return host_ntt(
            [c * pow(g, i, p) % p for i, c in enumerate(coeffs)], omega, p
        )

    a_c = coset_eval(host_intt(av, omega))
    b_c = coset_eval(host_intt(bv, omega))
    c_c = coset_eval(host_intt(cv, omega))
    zinv = pow((pow(g, n, p) - 1) % p, -1, p)
    h_ev = [(x * y - z) % p * zinv % p for x, y, z in zip(a_c, b_c, c_c)]
    h_coeffs_coset = host_intt(h_ev, omega)
    ginv = pow(g, -1, p)
    h_coeffs = [
        c * pow(ginv, i, p) % p for i, c in enumerate(h_coeffs_coset)
    ]
    rev = pn.bitrev
    expect = [h_coeffs[rev[i]] for i in range(n)]
    assert pf.unpack_np(np.asarray(h_bitrev)) == expect
    # canonical standard-form digit extraction (feeds the h MSM directly)
    std = pf.unpack_np(np.asarray(pn.to_std_canonical(h_bitrev)), mont=False)
    assert std == expect


def test_remont_matches_legacy_field():
    """Legacy narrow-R mont limbs -> wide-mont planes (ingestion kernel)."""
    from snark_tpu.fields import get_compute_field
    from snark_tpu.fields.host import Fp
    from snark_tpu.ops.pallas_field import digits8_from_limbs
    from snark_tpu.ops.ntt_plane import get_ntt_kernels, F32

    params = BN254.fr
    f = Fp(params)
    p = params.modulus
    rng = random.Random(4)
    vals = [rng.randrange(0, p) for _ in range(64)]
    limbs = jnp.asarray(f.to_mont_limbs_array(vals))
    k = get_ntt_kernels(params, tile=32, interpret=True)
    d = digits8_from_limbs(limbs, f.params.num_limbs).astype(F32)
    d = jnp.pad(d, ((0, k.pf.R8 - d.shape[0]), (0, 0)))
    planes = k.remont(d)[0]
    assert k.pf.unpack_np(np.asarray(planes)) == vals


def test_dif_sum_growth_no_underflow():
    """Regression for the round-2 on-chip config-2 corruption: the DIF
    sum side doubles values every stage; without the every-4th-stage
    normalizing butterfly, adversarial (but representable) inputs push
    |lo - hi| past the 84p fold at depth >= 2^7 and the lane silently
    wraps mod R (observed on hardware as delta == +tw at 2^15).

    Inputs here are crafted so the partial-sum imbalance is DETERMINISTIC
    (indices ≡ 2, 3 mod 4 carry value ~p, others ~0): the unnormalized
    pipeline would underflow at the depth-128 stage of a 512-point DIF.
    """
    params = BN254.fr
    p = params.modulus
    n = 512
    pn = get_plane_ntt(params, n, interpret=True)
    pf = pn.pf
    r_inv = pow(pf.r_eff, -1, p)
    rng = random.Random(8)
    vals = []
    for i in range(n):
        # choose v so the stored wide-Mont value v·R mod p is extreme
        target = rng.randrange(p - 5, p) if (i % 4) in (2, 3) else rng.randrange(0, 5)
        vals.append(target * r_inv % p)
    x = jnp.asarray(pf.pack_np(vals))
    got = pf.unpack_np(np.asarray(pn._dif(x, pn.inv_tw)))

    # host mirror of the DIF schedule (values mod p)
    h = list(vals)
    omega_inv = pow(params.root_of_unity(n), -1, p)
    log_n = n.bit_length() - 1
    for s in range(log_n - 1, -1, -1):
        half = 1 << s
        blocks = n // (2 * half)
        w = pow(omega_inv, n >> (s + 1), p)
        out = [0] * n
        for b in range(blocks):
            base = b * 2 * half
            tw = 1
            for t in range(half):
                lo = h[base + t]
                hi = h[base + half + t]
                out[base + t] = (lo + hi) % p
                out[base + half + t] = (lo - hi) * tw % p
                tw = tw * w % p
        h = out
    assert got == h


def test_hadamard_large_value_fold():
    """The Hadamard (A·B - C) fold must cover C values up to
    3.1p·(log2(n)+1) (DIT-fresh at big domains): K192 covers n <= 2^60.
    Feed a C plane with value ~150p directly (> the old K84 fold)."""
    params = BN254.fr
    p = params.modulus
    n = 64
    pn = get_plane_ntt(params, n, interpret=True)
    pf = pn.pf
    rng = random.Random(12)
    av = [rng.randrange(0, p) for _ in range(n)]
    bv = [rng.randrange(0, p) for _ in range(n)]
    cv = [rng.randrange(0, p) for _ in range(n)]
    A = jnp.asarray(pf.pack_np(av))
    B = jnp.asarray(pf.pack_np(bv))
    # C with stored value = canonical + 150p (legal lazy representative)
    c_big = np.zeros((pf.R8, n), dtype=np.float32)
    for j, v in enumerate(cv):
        raw = (v * pf.r_eff % p) + 150 * p
        for i in range(pf.R8):
            c_big[i, j] = (raw >> (8 * i)) & 0xFF
    C = jnp.asarray(c_big)
    got = pf.unpack_np(np.asarray(pn.hadamard(A, B, C)[0]))
    g = params.generator
    zinv = pow((pow(g, n, p) - 1) % p, -1, p)
    expect = [(x * y - z) % p * zinv % p for x, y, z in zip(av, bv, cv)]
    assert got == expect
