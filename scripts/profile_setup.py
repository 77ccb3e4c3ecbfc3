"""Profile circuit_specific_setup: where does the wall-clock go?

Runs a CONFIG3-shaped BLS12-381 setup at PROFILE_LOG_N (default 2^17)
under cProfile and prints the top cumulative entries + a stage summary.
"""

import cProfile
import io
import os
import pstats
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from snark_tpu.fields import BLS12_381, BN254
from snark_tpu.groth16 import Groth16
from snark_tpu.models import MulChainCircuit

log_n = int(os.environ.get("PROFILE_LOG_N", "17"))
curve = BLS12_381 if os.environ.get("PROFILE_CURVE", "bls") == "bls" else BN254
n = (1 << log_n) - 64
g16 = Groth16(curve)
circuit = MulChainCircuit(seed=7, n=n, batch=True)

t0 = time.time()
pr = cProfile.Profile()
pr.enable()
pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))
pr.disable()
print(f"TOTAL setup: {time.time() - t0:.1f}s at log_n={log_n} {curve.name}")

s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(40)
print(s.getvalue())
