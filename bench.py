"""Benchmark: Pippenger MSM point-adds/s on one chip (BASELINE north star).

Prints ONE JSON line:
  {"metric": "msm_point_adds_per_s", "value": N, "unit": "adds/s",
   "vs_baseline": N / 1e8, ...}

Work accounting: the bucket pipeline performs, per window,
  N point-adds (bucket-parallel scan over the sorted shard)
+ 2·c·2^c (suffix scan + total sum, batched) and the window combine runs
as ~num_bits doublings on host. point-adds/s = total group operations /
wall-clock. Baseline target: 1e8 adds/s/chip (BASELINE.md).

Timing is sync-forced: the host window-combine consumes the device sums, so
every iteration includes a real device->host round trip (the axon tunnel's
block_until_ready alone does NOT guarantee completion — measured).
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from snark_tpu.fields import BN254, Fp
    from snark_tpu.ops.curve import get_g1_ops
    from snark_tpu.ops.curve_host import host_g1
    from snark_tpu.ops.msm import (
        msm_host_combine,
        pick_window,
        scalars_to_digits,
    )

    # Default 2^14: the 2^16/c=10 program currently crashes the axon TPU
    # worker ("kernel fault"); 2^14/c=8 is validated end-to-end (correct=true)
    # on the real chip. Override with BENCH_LOG_N / BENCH_WINDOW.
    log_n = int(os.environ.get("BENCH_LOG_N", "14"))
    n = 1 << log_n
    curve = BN254
    fr = Fp(curve.fr)
    ops = get_g1_ops(curve)
    hc = host_g1(curve)
    rng = random.Random(7)

    # points: a small pool of distinct curve points tiled to N (point
    # distribution does not affect the group-op cost)
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    pts = jnp.asarray(
        np.tile(np.asarray(ops.pack_affine_host(pool)), (n // 64, 1, 1))
    )

    scalars = [fr.rand(rng) for _ in range(n)]
    nbits = curve.fr.num_bits
    c = int(os.environ.get("BENCH_WINDOW", "0")) or pick_window(n)
    digits = np.asarray(scalars_to_digits(fr.to_limbs_array(scalars), c, nbits))

    # warmup / compile (host combine forces a full sync)
    result = msm_host_combine(ops, hc, pts, digits, c)

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        result = msm_host_combine(ops, hc, pts, digits, c)
    dt = (time.time() - t0) / iters

    # correctness spot-check: points are the pool tiled, so the expected MSM
    # is Σ_j pool_j · (Σ_{i ≡ j (64)} s_i) — 64 host scalar-muls, not n
    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % fr.p
    want = hc.msm(pool, agg)
    ok = result == want

    W = -(-nbits // c)
    adds_per_window = n + 2 * c * (1 << c) + c
    total_adds = W * adds_per_window
    adds_per_s = total_adds / dt
    print(
        json.dumps(
            {
                "metric": "msm_point_adds_per_s",
                "value": round(adds_per_s),
                "unit": "adds/s",
                "vs_baseline": round(adds_per_s / 1e8, 6),
                "detail": {
                    "n_points": n,
                    "window_bits": c,
                    "num_windows": W,
                    "msm_wall_s": round(dt, 4),
                    "curve": "bn254_g1",
                    "correct": bool(ok),
                    "backend": jax.default_backend(),
                    "field_impl": os.environ.get("SNARK_TPU_FIELD_IMPL", "u32"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
