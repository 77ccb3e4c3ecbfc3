"""Stage-wise profile of the plane MSM on the real chip.

Times, per stage (all jitted, sync'd once per measurement):
  sort+boundaries | full window_sums | combine
and reports max bucket length (the while-loop trip count).
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
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
        negate_points_host,
        pack_rows_u8_host,
    )

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    signed = os.environ.get("BENCH_SIGNED", "1") == "1"
    c = int(os.environ.get("BENCH_WINDOW", "13" if signed else "12"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    n = 1 << log_n
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(7)

    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    rows64 = pack_rows_u8_host(pc, pool)
    parts = [np.tile(rows64, (n // 64, 1))]
    if signed:
        neg64 = pack_rows_u8_host(pc, negate_points_host(curve, pool))
        parts.append(np.tile(neg64, (n // 64, 1)))
    table = jnp.asarray(np.concatenate(parts, axis=0))

    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    nbits = curve.fr.num_bits
    to_digits = scalars_to_digits_signed if signed else scalars_to_digits
    digits = jnp.asarray(to_digits(fr.to_limbs_array(scalars), c, nbits))
    W = int(digits.shape[1])
    plan = get_plane_msm(curve, c, signed=signed)
    digits_t = jnp.asarray(digits).T

    nb = 1 << plan.cb

    # --- stage A: sort + boundaries only (keys via the plan's own scheme,
    # so the profiled stage cannot drift from the real pipeline) -----------
    @jax.jit
    def sort_stage(digits_t):
        keys, payload = plan.sort_keys(digits_t)
        d_sorted, perm = jax.lax.sort_key_val(keys, payload, dimension=-1)
        targets = jnp.broadcast_to(
            jnp.arange(nb + 1, dtype=jnp.uint32), (W, nb + 1)
        )
        boundaries = jax.vmap(jnp.searchsorted)(d_sorted, targets)
        return perm, boundaries

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
            jax.block_until_ready(out)
        return (time.time() - t0) / iters, out

    t_sort, (perm, bounds) = timeit(sort_stage, digits_t)
    bounds = np.asarray(bounds)
    length = bounds[:, 1:] - bounds[:, :-1]
    if not signed:
        length = np.where(np.asarray(plan.BUCKET0).reshape(W, nb), 0, length)
    max_len = int(length.max())

    t_sums, totals = timeit(plan._sums, table, digits_t)
    t_comb, _ = timeit(lambda *a: plan._combine(*a, W), *totals)

    lanes = W * nb
    print(
        {
            "signed": signed,
            "c": c,
            "W": W,
            "lanes": lanes,
            "max_len": max_len,
            "mean_len": float(length.mean()),
            "t_sort_s": round(t_sort, 4),
            "t_window_sums_s": round(t_sums, 4),
            "t_combine_s": round(t_comb, 4),
            "scan_steps": max_len,
            "per_step_ms": round(1e3 * (t_sums - t_sort) / max(max_len + 2 * plan.cb + plan.max_r, 1), 4),
        }
    )


if __name__ == "__main__":
    main()
