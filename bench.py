"""Benchmark: Pippenger MSM point-adds/s on one chip (BASELINE north star).

Prints ONE JSON line:
  {"metric": "msm_point_adds_per_s", "value": N, "unit": "adds/s",
   "vs_baseline": N / 1e8, ...}

Pipeline under test: the fused-Pallas plane MSM (ops/msm_plane.py) — the
whole MSM (sort, bucket scan with fused RCB15 complete adds, bucket
reduction, Horner window combine) runs on device in one dispatch per
phase, so the axon tunnel's ~25 ms per-dispatch latency (measured; it
dominated all per-op timing on this setup) is amortized over seconds of
device work. Timed region = full MSM including the device->host readback
of the final point.

Work accounting (group ops actually performed): per window N masked adds
(bucket scan) + 2·c·2^c (suffix scan + total) + replica collapses, plus
c doublings + 1 add per window in the combine. Baseline: 1e8 adds/s/chip.
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

    from snark_tpu.fields import BN254
    from snark_tpu.fields.host import Fp
    from snark_tpu.ops.curve_host import host_g1
    from snark_tpu.ops.msm import scalars_to_digits, scalars_to_digits_signed
    from snark_tpu.ops.msm_plane import get_plane_msm
    from snark_tpu.ops.pallas_curve import (
        get_plane_curve,
        pack_rows_u8_host,
        unpack_points_host,
    )

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    signed = os.environ.get("BENCH_SIGNED", "1") == "1"
    # signed (balanced) digits buy one extra window bit at the same bucket
    # count: c=13 signed has the bucket space of c=12 unsigned but 20
    # windows instead of 22
    c = int(os.environ.get("BENCH_WINDOW", "13" if signed else "12"))
    n = 1 << log_n
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(7)

    # points: a small pool of distinct curve points tiled to N (point
    # distribution does not affect the group-op cost; it enables an exact
    # host correctness check without N host scalar-muls)
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    # one N-row positive table for BOTH modes: signed digits carry their
    # sign in the gather payload and the kernel negates Y in-kernel
    table = jnp.asarray(np.tile(pack_rows_u8_host(pc, pool), (n // 64, 1)))

    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    nbits = curve.fr.num_bits
    # device-resident digits: in the prover pipeline digit extraction is a
    # device op (ops/msm.digits_from_limbs_device); re-uploading 92 MB per
    # iteration through the tunnel would otherwise dominate the timing
    to_digits = scalars_to_digits_signed if signed else scalars_to_digits
    digits = jnp.asarray(to_digits(fr.to_limbs_array(scalars), c, nbits))
    W = digits.shape[1]

    tile_env = os.environ.get("BENCH_TILE", "")
    tile = int(tile_env) if tile_env else None  # None = auto pick
    plan = get_plane_msm(curve, c, signed=signed, tile=tile)

    # warmup / compile
    X, Y, Z = plan.msm(table, digits)
    out0 = (np.asarray(X), np.asarray(Y), np.asarray(Z))

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        X, Y, Z = plan.msm(table, digits)
        np.asarray(X)  # full sync through the tunnel
    dt = (time.time() - t0) / iters

    # correctness: expected = Σ_j pool_j · (Σ_{i ≡ j (64)} s_i)
    got = unpack_points_host(pc, *out0)[0]
    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % curve.fr.modulus
    want = hc.msm(pool, agg)
    ok = got == want

    max_r = plan.max_r
    nb = 1 << plan.cb
    total_adds = (
        W * n  # bucket scan
        + 2 * plan.cb * W * nb  # suffix + total scans
        + max_r * W * nb  # replica collapse
        + W * (c + 1)  # Horner combine
    )
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
                    "signed_digits": signed,
                    "correct": bool(ok),
                    "backend": jax.default_backend(),
                    "pipeline": "pallas_plane_msm",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
