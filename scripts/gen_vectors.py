"""Generate committed regression vectors (tests/vectors/*.json).

SURVEY.md §4 calls for bit-exact field/NTT/MSM/proof vectors committed as
data. Without a Rust toolchain in this image the vectors are generated from
the HOST implementations (pure big-int Python — independent of the device
kernels they pin) under fixed seeds; they freeze today's semantics so any
future kernel change that flips a bit fails loudly. Conventions follow
arkworks (Montgomery I/O canonical, natural-order NTT over the derived
two-adic roots, LE serialization), so these double as the cross-check
corpus if an arkworks run is ever available.
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# vectors are host-semantics data; never touch the TPU tunnel from here
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from snark_tpu.fields import BLS12_381, BLS12_381_FR, BN254, BN254_FR, Fp
from snark_tpu.ops.curve_host import host_g1, host_g2

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "vectors",
)


def field_vectors(params, name, count=8):
    f = Fp(params)
    rng = random.Random(0xF00D)
    xs = [f.rand(rng) for _ in range(count)]
    ys = [f.rand(rng) for _ in range(count)]
    return {
        "field": name,
        "modulus": str(params.modulus),
        "two_adic_root_of_unity": str(params.two_adic_root_of_unity),
        "x": [str(v) for v in xs],
        "y": [str(v) for v in ys],
        "add": [str(f.add(a, b)) for a, b in zip(xs, ys)],
        "mul": [str(f.mul(a, b)) for a, b in zip(xs, ys)],
        "inv_x": [str(f.inv(a)) if a else "0" for a in xs],
        "root_of_unity_256": str(params.root_of_unity(256)),
    }


def ntt_vectors(params, name, n=16):
    f = Fp(params)
    rng = random.Random(0xBEEF)
    coeffs = [f.rand(rng) for _ in range(n)]
    g = params.root_of_unity(n)
    p = params.modulus

    def ev(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        return acc

    evals = [ev(pow(g, i, p)) for i in range(n)]
    return {
        "field": name,
        "n": n,
        "omega": str(g),
        "coeffs": [str(c) for c in coeffs],
        "evals_natural_order": [str(e) for e in evals],
    }


def curve_vectors(curve, name):
    g1 = host_g1(curve)
    g2 = host_g2(curve)
    ks = [1, 2, 7, 12345, curve.fr.modulus - 1]
    g1_pts = [g1.scalar_mul(g1.generator, k) for k in ks]
    g2_pts = [g2.scalar_mul(g2.generator, k) for k in ks]
    rng = random.Random(0xC0DE)
    msm_scalars = [rng.randrange(curve.fr.modulus) for _ in range(6)]
    msm_bases = [g1.scalar_mul(g1.generator, i + 1) for i in range(6)]
    msm_out = g1.msm(msm_bases, msm_scalars)
    return {
        "curve": name,
        "g1_scalar_muls": {
            str(k): [str(pt[0]), str(pt[1])] for k, pt in zip(ks, g1_pts)
        },
        "g2_scalar_muls": {
            str(k): [
                [str(pt[0][0]), str(pt[0][1])],
                [str(pt[1][0]), str(pt[1][1])],
            ]
            for k, pt in zip(ks, g2_pts)
        },
        "msm_scalars": [str(s) for s in msm_scalars],
        "msm_result": [str(msm_out[0]), str(msm_out[1])],
    }


def pairing_vectors(curve, name):
    from snark_tpu.groth16.pairing import get_pairing

    pr = get_pairing(curve)
    g1 = host_g1(curve)
    g2 = host_g2(curve)
    e = pr.pairing(g1.generator, g2.generator)

    def flat12(x):
        out = []
        for c6 in x:
            for c2 in c6:
                out.extend([str(c2[0]), str(c2[1])])
        return out

    return {"curve": name, "e_g1_g2_fq12": flat12(e)}


def proof_vectors():
    from snark_tpu.groth16 import Groth16
    from snark_tpu.models import MulChainCircuit
    from snark_tpu.snark import serialize as ser

    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=11, n=8, batch=False)
    pk, vk = g16.circuit_specific_setup(circuit, random.Random(0xA5A5))
    proof = g16.prove(pk, circuit, r=123456789, s=987654321)
    assert g16.verify(vk, [11], proof)
    return {
        "curve": "bn254",
        "circuit": "mulchain seed=11 n=8",
        "setup_seed": str(0xA5A5),
        "r": "123456789",
        "s": "987654321",
        "proof_bytes_hex": ser.serialize_proof(proof, BN254).hex(),
        "vk_bytes_hex": ser.serialize_vk(vk).hex(),
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    data = {
        "fields_bn254_fr.json": field_vectors(BN254_FR, "bn254_fr"),
        "fields_bls12_381_fr.json": field_vectors(BLS12_381_FR, "bls12_381_fr"),
        "ntt_bn254_fr.json": ntt_vectors(BN254_FR, "bn254_fr"),
        "curve_bn254.json": curve_vectors(BN254, "bn254"),
        "curve_bls12_381.json": curve_vectors(BLS12_381, "bls12_381"),
        "pairing_bn254.json": pairing_vectors(BN254, "bn254"),
        "proof_bn254.json": proof_vectors(),
    }
    for fname, payload in data.items():
        with open(os.path.join(OUT, fname), "w") as fh:
            json.dump(payload, fh, indent=1)
        print("wrote", fname)


if __name__ == "__main__":
    main()
