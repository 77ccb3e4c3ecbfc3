"""Device QAP instance map (groth16/qap_device.py) vs the host path.

Oracle: qap.py's pure-Python `lagrange_coeffs_at` /
`evaluate_variable_polys_at_tau` (themselves pinned by the end-to-end
Groth16 prove/verify tests). Bit-exactness is the requirement: the
device path replaces the host one inside circuit_specific_setup."""

import random

import numpy as np

from snark_tpu.fields import BN254, BLS12_381
from snark_tpu.fields.device import get_device_field
from snark_tpu.groth16.qap import (
    evaluate_variable_polys_at_tau,
    lagrange_coeffs_at,
)
from snark_tpu.groth16.qap_device import (
    batch_inverse_device,
    evaluate_uvw_device,
    lagrange_coeffs_device,
    powers_device,
)
from snark_tpu.models import MulChainCircuit, RandomLcCircuit
from snark_tpu.relations import (
    OptimizationGoal,
    R1CS_PREDICATE_LABEL,
    SynthesisMode,
    new_ref,
)


def test_powers_and_batch_inverse():
    params = BN254.fr
    df = get_device_field(params)
    p = params.modulus
    rng = random.Random(3)
    g = rng.randrange(2, p)
    n = 37
    got = df.to_host_ints(powers_device(df, g, n))
    assert got == [pow(g, j, p) for j in range(n)]
    xs = [rng.randrange(1, p) for _ in range(n)]
    inv = df.to_host_ints(batch_inverse_device(df, df.array(xs)))
    assert inv == [pow(x, -1, p) for x in xs]


def test_lagrange_device_matches_host():
    for params in (BN254.fr, BLS12_381.fr):
        rng = random.Random(5)
        n = 64
        tau = rng.randrange(2, params.modulus)
        df = get_device_field(params)
        lag_d = lagrange_coeffs_device(params, n, tau)
        assert lag_d is not None
        assert df.to_host_ints(lag_d) == lagrange_coeffs_at(params, n, tau)


def _setup_cs(circuit, fr):
    from snark_tpu.fields.host import Fp

    cs = new_ref(Fp(fr))
    cs.set_optimization_goal(OptimizationGoal.Constraints)
    cs.set_mode(SynthesisMode.setup())
    circuit.generate_constraints(cs)
    cs.finalize()
    return cs


def _check_uvw(circuit, curve):
    fr = curve.fr
    cs = _setup_cs(circuit, fr)
    inner = cs.inner
    matrices = cs.to_matrices()[R1CS_PREDICATE_LABEL]
    coo = inner.to_coo_arrays(R1CS_PREDICATE_LABEL)
    nc = cs.num_constraints()
    ni = inner.num_instance_variables
    m = ni + inner.num_witness_variables
    tau = random.Random(11).randrange(2, fr.modulus)
    u, v, w, z = evaluate_variable_polys_at_tau(fr, matrices, nc, ni, m, tau)
    dev = evaluate_uvw_device(
        fr, coo, inner.field_interner.values, nc, ni, m, tau
    )
    assert dev is not None
    ud, vd, wd, zd = dev
    df = get_device_field(fr)
    assert zd == z
    assert df.to_host_ints(ud) == u
    assert df.to_host_ints(vd) == v
    assert df.to_host_ints(wd) == w


def test_uvw_device_mulchain():
    _check_uvw(MulChainCircuit(seed=2, n=200, batch=True), BN254)


def test_uvw_device_random_lcs():
    # multi-term symbolic LCs exercise the LcMap-sourced COO rows
    _check_uvw(RandomLcCircuit(seed=4, n=64), BN254)


def test_uvw_device_bls():
    _check_uvw(MulChainCircuit(seed=6, n=100, batch=True), BLS12_381)
