"""UniversalSetupSNARK contract: bounded indexing, NeedLargerBound,
deterministic keys from public parameters, end-to-end prove/verify."""

import random

import pytest

from snark_tpu.fields import BN254
from snark_tpu.models import MulChainCircuit
from snark_tpu.snark.api import NeedLargerBound
from snark_tpu.snark.universal import (
    ComputationBound,
    UniversalGroth16,
    PublicParameters,
)


def test_universal_lifecycle():
    u = UniversalGroth16(BN254)
    rng = random.Random(0)
    pp = u.universal_setup(ComputationBound(max_constraints=32), rng)
    circuit = MulChainCircuit(seed=3, n=8, batch=False)
    pk, vk = u.index(pp, circuit)
    proof = u.prove(pk, circuit, r=1, s=2)
    assert u.verify(vk, [3], proof)

    # identical parameters -> identical keys (deterministic derivation)
    pk2, vk2 = u.index(pp, circuit)
    assert vk2 == vk


def test_universal_need_larger_bound():
    u = UniversalGroth16(BN254)
    rng = random.Random(1)
    pp = u.universal_setup(ComputationBound(max_constraints=4), rng)
    big = MulChainCircuit(seed=3, n=16, batch=False)
    with pytest.raises(NeedLargerBound) as exc:
        u.index(pp, big)
    assert exc.value.bound.max_constraints >= 16
