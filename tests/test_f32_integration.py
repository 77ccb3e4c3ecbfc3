"""f32-field integration smoke: tiny NTT / curve / MSM / prove pipeline runs
with SNARK_TPU_FIELD_IMPL=f32 in a subprocess (the production TPU path).

Process-isolated because the field implementation is chosen per process.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import os
os.environ["SNARK_TPU_FIELD_IMPL"] = "f32"
os.environ["JAX_PLATFORMS"] = "cpu"
import random
import numpy as np
import jax

from snark_tpu.fields import BN254, BN254_FR, Fp, get_compute_field
from snark_tpu.fields.device_f32 import DeviceFieldF32
from snark_tpu.ops.curve import get_g1_ops
from snark_tpu.ops.curve_host import host_g1
from snark_tpu.ops.msm import msm
from snark_tpu.ops.ntt import get_ntt_plan

assert isinstance(get_compute_field(BN254_FR), DeviceFieldF32)

f = Fp(BN254_FR)
rng = random.Random(0)

# NTT n=16 vs naive DFT
n = 16
plan = get_ntt_plan(BN254_FR, n)
coeffs = [f.rand(rng) for _ in range(n)]
evals = plan.df.to_host_ints(plan.fft(plan.df.array(coeffs)))
g = BN254_FR.root_of_unity(n)
p = f.p
def ev(x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc
assert evals == [ev(pow(g, i, p)) for i in range(n)], "ntt mismatch"
back = plan.df.to_host_ints(plan.ifft(plan.fft(plan.df.array(coeffs))))
assert back == coeffs

# curve add/double
ops = get_g1_ops(BN254)
hc = host_g1(BN254)
pts = [hc.scalar_mul(hc.generator, k) for k in (1, 2, 5)] + [None]
dev = ops.pack_affine_host(pts)
assert ops.to_affine_host(ops.add(dev, dev)) == [hc.double(q) for q in pts]

# MSM 8 points
pts8 = [hc.scalar_mul(hc.generator, k + 1) for k in range(8)]
scalars = [f.rand(rng) for _ in range(8)]
acc = msm(ops, ops.pack_affine_host(pts8), f.to_limbs_array(scalars),
          BN254.fr.num_bits, c=4)
assert ops.to_affine_host(acc[None])[0] == hc.msm(pts8, scalars), "msm mismatch"
print("F32-INTEGRATION-OK")
"""


import pytest


@pytest.mark.slow
def test_f32_integration_subprocess():
    env = dict(os.environ)
    env["SNARK_TPU_FIELD_IMPL"] = "f32"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
        cwd=repo,
    )
    assert "F32-INTEGRATION-OK" in out.stdout, out.stdout + out.stderr
