"""TPU A/B bench: batch-affine tree vs projective-scan bucket phase.

Runs the full plane MSM (sort -> accumulate -> fold -> combine) both
ways on the same inputs, checks both against the host oracle, and
prints per-path wall times. BENCH_LOG_N / BENCH_WINDOW as in bench.py.
"""

import json
import os
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

import jax.numpy as jnp
import numpy as np

from snark_tpu.fields import BN254
from snark_tpu.fields.host import Fp
from snark_tpu.ops.curve_host import host_g1
from snark_tpu.ops.msm import scalars_to_digits_signed
from snark_tpu.ops.msm_plane import get_plane_msm
from snark_tpu.ops.pallas_curve import (
    get_plane_curve,
    pack_rows_u8_host,
    unpack_points_host,
)


def main():
    log_n = int(os.environ.get("BENCH_LOG_N", "18"))
    c = int(os.environ.get("BENCH_WINDOW", "13"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    n = 1 << log_n
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(7)
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    table = jnp.asarray(np.tile(pack_rows_u8_host(pc, pool), (n // 64, 1)))
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    if os.environ.get("BENCH_CLUSTER") == "1":
        # real-witness shape: half the scalars are small (~44-bit) values
        # drawn from a tiny set — boundary-window buckets go monster
        # (the 2^16 MulChain pattern that motivated the spill scheduler)
        vals = [rng.randrange(0, 1 << 44) for _ in range(8)]
        for i in range(0, n, 2):
            scalars[i] = vals[(i // 2) % 8]
    digits = jnp.asarray(
        scalars_to_digits_signed(
            fr.to_limbs_array(scalars), c, curve.fr.num_bits
        )
    )
    agg = [0] * 64
    for i, s in enumerate(scalars):
        agg[i % 64] = (agg[i % 64] + s) % curve.fr.modulus
    want = hc.msm(pool, agg)

    results = {}
    for affine in (True, False):
        os.environ["SNARK_TPU_MSM_AFFINE"] = "1" if affine else "0"
        # fresh plan per mode (use_affine is baked at construction)
        from snark_tpu.ops import msm_plane

        msm_plane._PLANS.clear()
        plan = get_plane_msm(curve, c, signed=True)
        name = "affine" if affine else "projective"
        t0 = time.time()
        X, Y, Z = plan.msm(table, digits)
        out0 = (np.asarray(X), np.asarray(Y), np.asarray(Z))
        t_compile = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            X, Y, Z = plan.msm(table, digits)
            np.asarray(X)
        dt = (time.time() - t0) / iters
        got = unpack_points_host(pc, *out0)[0]
        ok = got == want
        W = int(digits.shape[1])
        nb = 1 << plan.cb
        total_adds = (
            W * n
            + 2 * plan.cb * W * nb
            + plan.max_r * W * nb
            + W * (c + 1)
        )
        results[name] = {
            "wall_s": round(dt, 4),
            "first_s": round(t_compile, 1),
            "adds_per_s": round(total_adds / dt),
            "correct": bool(ok),
        }
        print(json.dumps({name: results[name]}), flush=True)
    # G2 affine correctness on the real chip (the CPU suite cannot
    # compile the emu G2 phase kernels — XLA:CPU segfault; this is the
    # G2 affine oracle check)
    if os.environ.get("BENCH_G2", "1") == "1":
        from snark_tpu.ops import msm_plane
        from snark_tpu.ops.curve_host import host_g2

        os.environ["SNARK_TPU_MSM_AFFINE"] = "1"
        msm_plane._PLANS.clear()
        hc2 = host_g2(curve)
        n2, c2 = 1 << 14, 8
        pool2 = [hc2.scalar_mul(hc2.generator, k + 1) for k in range(16)]
        table2 = jnp.asarray(
            np.tile(pack_rows_u8_host(pc, pool2, "g2"), (n2 // 16, 1))
        )
        sc2 = [rng.randrange(0, curve.fr.modulus) for _ in range(n2)]
        d2 = jnp.asarray(
            scalars_to_digits_signed(
                fr.to_limbs_array(sc2), c2, curve.fr.num_bits
            )
        )
        plan2 = get_plane_msm(curve, c2, group="g2", signed=True)
        assert plan2.use_affine, "G2 affine must engage on TPU"
        got2 = plan2.msm_host(table2, d2, hc2)
        agg2 = [0] * 16
        for i, s in enumerate(sc2):
            agg2[i % 16] = (agg2[i % 16] + s) % curve.fr.modulus
        ok2 = got2 == hc2.msm(pool2, agg2)
        print(json.dumps({"g2_affine_correct": bool(ok2), "n": n2}), flush=True)

    if "affine" in results and "projective" in results:
        print(
            json.dumps(
                {
                    "speedup": round(
                        results["projective"]["wall_s"]
                        / results["affine"]["wall_s"],
                        3,
                    ),
                    "log_n": log_n,
                    "c": c,
                }
            )
        )


if __name__ == "__main__":
    main()
