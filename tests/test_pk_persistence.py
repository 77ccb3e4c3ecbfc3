"""Proving-key checkpoint/resume: save -> load -> prove with the reloaded
key -> verify (SURVEY.md §5 persistence parity)."""

import random

from snark_tpu.fields import BN254
from snark_tpu.groth16 import Groth16
from snark_tpu.groth16.groth16 import ProvingKey
from snark_tpu.models import MulChainCircuit


def test_pk_save_load_prove(tmp_path):
    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=9, n=8, batch=False)
    pk, vk = g16.circuit_specific_setup(circuit, random.Random(4))
    path = str(tmp_path / "pk.npz")
    pk.save(path)
    pk2 = ProvingKey.load(path)
    assert pk2.vk == vk
    assert pk2.domain_size == pk.domain_size
    proof = g16.prove(pk2, circuit, r=5, s=6)
    assert g16.verify(vk, [9], proof)
    # identical to proving with the original key
    assert proof == g16.prove(pk, circuit, r=5, s=6)
