"""BASELINE.json graded-config harness.

Runs the configs that fit the current hardware and prints one JSON line per
config. Config sizes / device requirements:

  1: 2^10 a*b=c chain, CPU synthesize + sat-check          (always runs)
  2: 2^16-constraint Groth16-style prove, 1 chip           (CONFIG2=1)
  3: 2^20 BLS12-381, 1 host                                 (round 2)
  4: 2^24 multi-host                                        (round 2)
  5: 256 x 2^18 batched                                     (round 2)

Usage: python scripts/run_configs.py            # config 1
       CONFIG2=1 python scripts/run_configs.py  # + config 2 on the chip
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def config1():
    from snark_tpu.fields import BN254_FR, Fp
    from snark_tpu.models import MulChainCircuit
    from snark_tpu.relations import new_ref

    n = 1 << 10
    t0 = time.time()
    cs = new_ref(Fp(BN254_FR))
    MulChainCircuit(seed=7, n=n, batch=True).generate_constraints(cs)
    cs.finalize()
    sat = cs.is_satisfied()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "config": 1,
                "desc": "2^10 a*b=c chain, synthesize+sat-check (CPU)",
                "constraints": n,
                "satisfied": sat,
                "wall_s": round(dt, 3),
            }
        )
    )
    assert sat


def config2():
    from snark_tpu.fields import BN254
    from snark_tpu.groth16 import Groth16
    from snark_tpu.models import MulChainCircuit

    n = (1 << 16) - 64  # domain rounds to 2^16
    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=7, n=n, batch=True)
    t0 = time.time()
    pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))
    t_setup = time.time() - t0
    t0 = time.time()
    proof = g16.prove(pk, circuit, rng=random.Random(1))
    t_prove = time.time() - t0
    t0 = time.time()
    ok = g16.verify(vk, [7], proof)
    t_verify = time.time() - t0
    print(
        json.dumps(
            {
                "config": 2,
                "desc": "2^16-constraint Groth16 prove (1 chip)",
                "constraints": n,
                "domain": pk.domain_size,
                "verified": ok,
                "setup_s": round(t_setup, 2),
                "prove_s": round(t_prove, 2),
                "verify_s": round(t_verify, 2),
            }
        )
    )
    assert ok


if __name__ == "__main__":
    config1()
    if os.environ.get("CONFIG2") == "1":
        config2()
