"""Constraint-synthesis throughput — mirror of relations/examples/bench.rs
and bench-no-finalize.rs: n random constraints with <=TERMS-term LCs,
timed with and without finalize() (LC inlining), plus the TPU-first batch
API for comparison.

Run: python examples/bench_synthesis.py [log2_n]   (default 2^16; the
reference benches at 2^23 — pass 23 for parity, it is pure host work)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snark_tpu.fields import BLS12_381_FR, Fp
from snark_tpu.models import MulChainCircuit, RandomLcCircuit
from snark_tpu.relations import SynthesisMode, new_ref
from snark_tpu.utils import test_rng

NUM_COEFFS_IN_LC = 10  # matches bench.rs:13


def bench(n: int, finalize: bool, construct_matrices: bool = True) -> float:
    f = Fp(BLS12_381_FR)
    cs = new_ref(f)
    cs.set_mode(
        SynthesisMode.prove(
            construct_matrices=construct_matrices,
            generate_lc_assignments=False,
        )
    )
    circuit = RandomLcCircuit(n=n, terms_per_lc=NUM_COEFFS_IN_LC, seed=0)
    t0 = time.perf_counter()
    circuit.generate_constraints(cs)
    if finalize:
        cs.finalize()
    dt = time.perf_counter() - t0
    if construct_matrices:
        assert cs.num_constraints() == n
    return dt


def bench_batch_chain(n: int) -> float:
    """The columnar batch path on the a*b=c chain (config-1 shape)."""
    f = Fp(BLS12_381_FR)
    cs = new_ref(f)
    t0 = time.perf_counter()
    MulChainCircuit(seed=7, n=n, batch=True).generate_constraints(cs)
    cs.finalize()
    dt = time.perf_counter() - t0
    assert cs.num_constraints() == n
    return dt


def bench_native(n: int) -> tuple[float, float]:
    """The C++ engine end-to-end on the bench.rs workload: random-LC
    generation + interning + columnar storage (lc_synth_random), then the
    native inline pass — the TPU-first production path for synthesis at
    scale (VERDICT r1 item 8)."""
    from snark_tpu.relations.native import NativeInliner, NativeSynthesizer

    p = BLS12_381_FR.modulus
    ns = NativeSynthesizer(p)
    ni = NativeInliner(p)
    t0 = time.perf_counter()
    off, vars_, cids, vals, argv = ns.synthesize(
        n, NUM_COEFFS_IN_LC, seed=0, num_vars=max(64, n // 4)
    )
    t_synth = time.perf_counter() - t0
    import numpy as np

    t0 = time.perf_counter()
    pre = np.zeros((2, 4), dtype=np.uint64)
    pre[0, 0] = 1
    pm1 = p - 1
    pre[1] = [(pm1 >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]
    ni.inline_raw(off, vars_, cids, np.concatenate([pre, vals], axis=0))
    t_inline = time.perf_counter() - t0
    return t_synth, t_inline


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log_n
    dt1 = bench(n, finalize=True)
    print(f"random-LC synthesis 2^{log_n} with finalize:    {dt1:8.3f} s "
          f"({n/dt1:,.0f} constraints/s)", flush=True)
    dt2 = bench(n, finalize=False, construct_matrices=False)
    print(f"random-LC synthesis 2^{log_n} no finalize/mats: {dt2:8.3f} s "
          f"({n/dt2:,.0f} constraints/s)", flush=True)
    dt3 = bench_batch_chain(n)
    print(f"batch-API a*b=c chain 2^{log_n} + finalize:     {dt3:8.3f} s "
          f"({n/dt3:,.0f} constraints/s)", flush=True)
    try:
        ts, ti = bench_native(n)
        print(f"native-engine random-LC 2^{log_n}: synth {ts:7.3f} s "
              f"({n/ts:,.0f} c/s) + inline {ti:7.3f} s "
              f"({n/ti:,.0f} c/s)", flush=True)
    except RuntimeError as e:
        print(f"native engine unavailable: {e}")


if __name__ == "__main__":
    main()
