"""Synthesis + witness-evaluation throughput at bench.rs shapes.

Reference workload: relations/examples/bench.rs:85-109 — 2^23 random
constraints, <=10-term LCs — which prints wall-clock and publishes no
numbers. This harness runs:

  1. native C++ random-LC synthesis (intern + columnar CSR),
  2. native batched witness evaluation of ALL argument LCs against a
     random assignment (the eval_lc hot loop, assignment.rs:40-52),
  3. native LC inlining (inline_all_lcs, constraint_system.rs:717-758),
  4. the Python batch-CSR API (MulChain shape) for comparison,

and writes BENCH_SYNTH_r03.json. Usage: python scripts/bench_synth.py
[log_n].
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snark_tpu.fields import BLS12_381
from snark_tpu.relations.native import (
    NativeEvaluator,
    NativeSynthesizer,
    get_inliner,
    _to_u64x4,
)

TAG_SHIFT = 61


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    n = 1 << log_n
    terms = 10
    p = BLS12_381.fr.modulus
    results = {}

    synth = NativeSynthesizer(p)
    t0 = time.time()
    num_vars = n  # one witness var per constraint, bench.rs shape
    offsets, vars_, coeff_ids, values, arg_vars = synth.synthesize(
        n * 3, terms, seed=7, num_vars=num_vars
    )
    dt = time.time() - t0
    results["native_synth_s"] = round(dt, 2)
    results["native_synth_constraints_per_s"] = int(n / dt)
    nnz = int(offsets[-1])
    results["nnz"] = nnz

    # witness evaluation: all 3n argument LCs against a random assignment
    ev = NativeEvaluator(p)
    rng = np.random.RandomState(3)
    assignment = rng.randint(0, 2**63, size=(num_vars, 4)).astype(np.uint64)
    assignment[:, 3] &= (1 << 58) - 1  # < p
    t0 = time.time()
    var_to_col = (vars_ & ((1 << TAG_SHIFT) - 1)).astype(np.int64)
    tags = (vars_ >> TAG_SHIFT).astype(np.int64)
    var_to_col[tags == 0] = -1  # Zero
    out = ev.eval_rows(
        offsets, vars_, coeff_ids, values, assignment, var_to_col
    )
    dt = time.time() - t0
    results["native_witness_eval_s"] = round(dt, 2)
    results["native_witness_eval_lcs_per_s"] = int(3 * n / dt)
    results["native_witness_eval_constraints_per_s"] = int(n / dt)
    results["witness_eval_checksum"] = int(out[:, 0].sum() % (1 << 63))

    # inline pass (finalize analogue)
    inliner = get_inliner(p)
    t0 = time.time()
    inliner.inline_raw(offsets, vars_, coeff_ids, values)
    dt = time.time() - t0
    results["native_inline_s"] = round(dt, 2)
    results["native_inline_constraints_per_s"] = int(n / dt)

    # end-to-end: synthesis + witness eval
    total = results["native_synth_s"] + results["native_witness_eval_s"]
    results["synth_plus_witness_s"] = round(total, 2)
    results["synth_plus_witness_constraints_per_s"] = int(n / total)

    doc = {
        "metric": f"gr1cs_synthesis_2e{log_n}",
        "shape": f"bench.rs parity: 2^{log_n} random constraints, "
                 f"<={terms}-term LCs, BLS12-381 Fr",
        "results": results,
        "hardware": "2 vCPU host (GCP)",
        "reference": "relations/examples/bench.rs:85-109 prints wall-clock "
                     "only, publishes no numbers",
    }
    print(json.dumps(doc))
    if log_n == 23:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_SYNTH_r03.json"), "w"
        ) as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
