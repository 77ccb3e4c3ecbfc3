"""Benchmark: Pippenger MSM point-adds/s on one chip (BASELINE north star).

Prints ONE JSON line:
  {"metric": "msm_point_adds_per_s", "value": N, "unit": "adds/s",
   "vs_baseline": N / 1e8}

Work accounting: the bucket pipeline performs, per window,
  N point-adds (bucket-parallel serial scan over the sorted shard)
+ 2·c·2^c (suffix scan + total sum) + c doublings (window combine);
point-adds/s = total such group operations / wall-clock. The baseline
target is 1e8 adds/s/chip (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from snark_tpu.fields import BN254, Fp
    from snark_tpu.groth16.groth16 import _fixed_base_g1
    from snark_tpu.ops.curve import get_g1_ops
    from snark_tpu.ops.msm import MsmPlan, pick_window, scalars_to_digits

    log_n = int(os.environ.get("BENCH_LOG_N", "16"))
    n = 1 << log_n
    curve = BN254
    fr = Fp(curve.fr)
    ops = get_g1_ops(curve)
    rng = random.Random(7)

    # random points as [k]G via device fixed-base; random scalars
    base_scalars = [fr.rand(rng) for _ in range(n)]
    points = _fixed_base_g1(curve, base_scalars)
    points.block_until_ready()

    scalars = [fr.rand(rng) for _ in range(n)]
    nbits = curve.fr.num_bits
    c = pick_window(n)
    digits = jnp.asarray(scalars_to_digits(fr.to_limbs_array(scalars), c, nbits))
    plan = MsmPlan(ops, c)

    # warmup / compile
    out = plan(points, digits)
    out.block_until_ready()

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        out = plan(points, digits)
    out.block_until_ready()
    dt = (time.time() - t0) / iters

    W = digits.shape[1]
    adds_per_window = n + 2 * c * (1 << c) + c
    total_adds = W * adds_per_window
    adds_per_s = total_adds / dt
    print(
        json.dumps(
            {
                "metric": "msm_point_adds_per_s",
                "value": round(adds_per_s),
                "unit": "adds/s",
                "vs_baseline": round(adds_per_s / 1e8, 4),
                "detail": {
                    "n_points": n,
                    "window_bits": c,
                    "num_windows": W,
                    "msm_wall_s": round(dt, 4),
                    "curve": "bn254_g1",
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
