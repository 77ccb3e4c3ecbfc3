"""End-to-end Groth16: setup -> prove -> verify on both curves.

The definitive integration oracle: a valid proof verifies; wrong public
inputs and tampered proofs do not. Deterministic (r, s) also exercises the
zero-randomness path.
"""

import random

import pytest

from snark_tpu.fields import BLS12_381, BN254
from snark_tpu.groth16 import Groth16
from snark_tpu.models import MulChainCircuit


@pytest.mark.parametrize(
    "curve",
    [BN254, pytest.param(BLS12_381, marks=pytest.mark.slow)],
    ids=lambda c: getattr(c, "name", "bls12_381"),
)
def test_groth16_end_to_end(curve):
    rng = random.Random(42)
    g16 = Groth16(curve)
    n = 12  # constraints (domain rounds to 16)
    circuit = MulChainCircuit(seed=7, n=n, batch=False)
    pk, vk = g16.circuit_specific_setup(circuit, rng)

    proof = g16.prove(pk, circuit, rng=rng)
    public_input = [7 % curve.fr.modulus]  # x0 (without the leading ONE)
    assert g16.verify(vk, public_input, proof)

    # wrong public input fails
    assert not g16.verify(vk, [8], proof)

    # tampered proof fails
    from snark_tpu.groth16.groth16 import Proof
    bad = Proof(a=proof.c, b=proof.b, c=proof.a)
    assert not g16.verify(vk, public_input, bad)


def test_groth16_deterministic_rs():
    curve = BN254
    g16 = Groth16(curve)
    circuit = MulChainCircuit(seed=3, n=8, batch=False)
    rng = random.Random(1)
    pk, vk = g16.circuit_specific_setup(circuit, rng)
    p1 = g16.prove(pk, circuit, r=123, s=456)
    p2 = g16.prove(pk, circuit, r=123, s=456)
    assert p1 == p2  # fully deterministic with pinned randomness
    assert g16.verify(vk, [3], p1)
    p3 = g16.prove(pk, circuit, r=124, s=456)
    assert p3 != p1
    assert g16.verify(vk, [3], p3)  # different randomness, still valid


def test_groth16_batch_circuit_path():
    """The batch synthesis API produces the same provable system."""
    curve = BN254
    g16 = Groth16(curve)
    rng = random.Random(5)
    circuit = MulChainCircuit(seed=11, n=16, batch=True)
    pk, vk = g16.circuit_specific_setup(circuit, rng)
    proof = g16.prove(pk, circuit, rng=rng)
    assert g16.verify(vk, [11], proof)


def test_prove_requires_rng_or_explicit_opt_in():
    """prove() with no randomness source must refuse (snark/src/lib.rs:16-19
    requires RngCore + CryptoRng); deterministic=True is the explicit
    escape hatch and yields the r=s=0 proof."""
    rng = random.Random(3)
    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=2, n=8, batch=False)
    pk, vk = g16.circuit_specific_setup(circuit, rng)
    with pytest.raises(ValueError, match="zero-knowledge"):
        g16.prove(pk, circuit)
    p0 = g16.prove(pk, circuit, deterministic=True)
    assert p0 == g16.prove(pk, circuit, r=0, s=0)
    assert g16.verify(vk, [2 % BN254.fr.modulus], p0)


@pytest.mark.slow
def test_groth16_plane_signed_matches_legacy():
    """The production plane prover path (signed digits, in-kernel Y
    negation, five-MSM overlapped dispatch) produces the SAME proof as
    the legacy small-circuit path at the same (r, s) — the plane stack's
    end-to-end equivalence oracle on the CPU emu kernels."""
    import os

    curve = BN254
    g16 = Groth16(curve)
    n = (1 << 11) - 64  # domain 2^11 (smallest the plane NTT path runs)
    circuit = MulChainCircuit(seed=5, n=n, batch=True)
    pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))

    old = os.environ.get("SNARK_TPU_PLANE_MSM_MIN")
    try:
        os.environ["SNARK_TPU_PLANE_MSM_MIN"] = "1024"
        p_plane = g16.prove(pk, circuit, r=17, s=23)
        os.environ["SNARK_TPU_PLANE_MSM_MIN"] = str(1 << 30)
        p_legacy = g16.prove(pk, circuit, r=17, s=23)
    finally:
        if old is None:
            os.environ.pop("SNARK_TPU_PLANE_MSM_MIN", None)
        else:
            os.environ["SNARK_TPU_PLANE_MSM_MIN"] = old
    assert p_plane == p_legacy
    assert g16.verify(vk, [5 % curve.fr.modulus], p_plane)
