"""Distributed plane-kernel primitives on the virtual 8-device CPU mesh.

Validates the production (fused-Pallas) dist stack that replaces the
legacy-kernel dist paths of round 1: point-sharded plane MSM with
window-total all_gather + lane-parallel fold, and the six-step plane NTT
against the single-chip plane/host oracles.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_tpu.fields import BN254, BN254_FR, Fp
from snark_tpu.ops.curve_host import host_g1
from snark_tpu.ops.msm import scalars_to_digits_signed
from snark_tpu.ops.ntt import get_ntt_plan
from snark_tpu.ops.pallas_curve import (
    get_plane_curve,
    pack_rows_u8_host,
)
from snark_tpu.parallel import make_mesh
from snark_tpu.parallel.plane_dist import DistPlaneMsm, DistPlaneNtt


def test_dist_plane_msm_matches_host():
    # default-suite dist coverage (VERDICT r4 item 8): the production
    # dist-MSM stack (window-block all_to_all + sharded folds) runs on
    # the virtual 8-device mesh every CI run (~3 min warm-cached in its
    # own per-file process; the full dist prover/NTT stay slow-marked
    # and are exercised by the driver's multichip dryrun each round)
    ndev = 8
    mesh = make_mesh((ndev,), ("tp",))
    curve = BN254
    hc = host_g1(curve)
    pc = get_plane_curve(curve)
    fr = Fp(curve.fr)
    rng = random.Random(11)

    n = 512
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(16)]
    points = [pool[i % 16] for i in range(n)]
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]

    c = 6
    dm = DistPlaneMsm(curve, c, mesh, "tp", tile=32, signed=True)
    table = dm.shard_table(pack_rows_u8_host(pc, points))

    digits = np.asarray(
        scalars_to_digits_signed(
            fr.to_limbs_array(scalars), c, curve.fr.num_bits
        )
    )
    got = dm.msm_host(table, digits, hc)
    want = hc.msm(points, scalars)
    assert got == want


@pytest.mark.slow
def test_dist_plane_ntt_matches_local():
    ndev = 8
    mesh = make_mesh((ndev,), ("sp",))
    params = BN254_FR
    f = Fp(params)
    rng = random.Random(5)
    n1, n2 = 16, 32
    n = n1 * n2
    coeffs = [f.rand(rng) for _ in range(n)]

    dn = DistPlaneNtt(params, n1, n2, mesh, "sp")
    pf = dn.pf
    x = jnp.asarray(pf.pack_np(coeffs))  # (R8, n) wide-mont planes

    # forward: natural coeffs -> natural evals, vs the u32 local plan
    local = get_ntt_plan(params, n, coset=False)
    want = local.fft_host_ints(coeffs) if hasattr(local, "fft_host_ints") else None
    evals = dn.fft(x)
    got = pf.unpack_np(np.asarray(evals))
    # oracle: direct host evaluation via the u32 device plan
    df = local.df if hasattr(local, "df") else None
    from snark_tpu.fields import get_compute_field

    dfc = get_compute_field(params)
    ref = dfc.to_host_ints(local.fft(dfc.array(coeffs)))
    assert got == ref

    # inverse round-trips
    back = dn.ifft(evals)
    assert pf.unpack_np(np.asarray(back)) == [v % params.modulus for v in coeffs]


@pytest.mark.slow
def test_dist_plane_h_matches_single_chip():
    """h pipeline: dist (natural order) == single-chip plane h (bitrev) up
    to the bit-reversal permutation."""
    ndev = 8
    mesh = make_mesh((ndev,), ("sp",))
    params = BN254_FR
    f = Fp(params)
    rng = random.Random(9)
    n1, n2 = 16, 16
    n = n1 * n2

    a = [f.rand(rng) for _ in range(n)]
    b = [f.rand(rng) for _ in range(n)]
    # pick c so the quotient is exact: c = a*b pointwise on the domain
    c = [x * y % params.modulus for x, y in zip(a, b)]

    dn = DistPlaneNtt(params, n1, n2, mesh, "sp")
    pf = dn.pf
    A = jnp.asarray(pf.pack_np(a))
    B = jnp.asarray(pf.pack_np(b))
    C = jnp.asarray(pf.pack_np(c))
    h_dist = pf.unpack_np(np.asarray(dn.h_from_evals(A, B, C)))

    from snark_tpu.ops.ntt_plane import _bit_reverse_indices, get_plane_ntt

    pn = get_plane_ntt(params, n)
    h_br = pf.unpack_np(np.asarray(pn.h_from_evals(A, B, C)))
    rev = _bit_reverse_indices(n)
    assert h_dist == [h_br[rev[i]] for i in range(n)]


@pytest.mark.slow
def test_dist_plane_prover_end_to_end():
    """Full distributed prove -> verify on the 8-device mesh (small size;
    the >=2^14 version runs in __graft_entry__.dryrun_multichip)."""
    from snark_tpu.groth16 import Groth16
    from snark_tpu.models import MulChainCircuit
    from snark_tpu.parallel.plane_dist import DistPlaneProver

    mesh = make_mesh((8,), ("tp",))
    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=3, n=60, batch=False)
    pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))
    assert pk.domain_size == 64

    dp = DistPlaneProver(g16, pk, mesh, "tp")
    proof = dp.prove(circuit, r=7, s=9)
    assert g16.verify(vk, [3 % BN254.fr.modulus], proof)
    # bit-identical to the single-chip prover at the same (r, s)
    assert proof == g16.prove(pk, circuit, r=7, s=9)
