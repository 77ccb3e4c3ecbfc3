"""Split the bucket-scan step cost: gather+decode vs fused madd.

Runs the REAL _window_sums_impl loop twice: once as shipped, once with
the madd replaced by a trivial consume (accumulate f32 sum) — the delta
is the kernel compute that the gather cannot hide (or vice versa).
"""

from __future__ import annotations

import os
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
    import jax.numpy as jnp
    import numpy as np

    from snark_tpu.fields import BN254
    from snark_tpu.fields.host import Fp
    from snark_tpu.ops.msm import scalars_to_digits_signed
    from snark_tpu.ops.msm_plane import get_plane_msm
    import random

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    n = 1 << log_n
    curve = BN254
    fr = Fp(curve.fr)
    rng = random.Random(7)
    plan = get_plane_msm(curve, 13, signed=True)
    W, nb = plan.W, 1 << plan.cb
    lanes = W * nb
    KR = plan.K * plan.pc.R8

    table = jnp.zeros((n, 2 * KR + 1), jnp.uint8)
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    digits_t = jnp.asarray(
        scalars_to_digits_signed(fr.to_limbs_array(scalars), 13, curve.fr.num_bits)
    ).T

    def timeit(f, *a, iters=3):
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.time() - t0) / iters

    # full real pipeline
    t_full = timeit(plan._sums, table, digits_t)

    # gather-only: same sort/boundaries/loop/gather but trivial consume
    @jax.jit
    def gather_only(table, digits_t):
        keys, payload = plan.sort_keys(digits_t)
        d_sorted, perm = jax.lax.sort_key_val(keys, payload, dimension=-1)
        targets = jnp.broadcast_to(
            jnp.arange(nb + 1, dtype=jnp.uint32), (W, nb + 1)
        )
        boundaries = jax.vmap(jnp.searchsorted)(d_sorted, targets)
        start = boundaries[:, :-1].astype(jnp.int32).reshape(lanes)
        length = (boundaries[:, 1:] - boundaries[:, :-1]).astype(jnp.int32)
        max_len = jnp.max(jnp.minimum(length, 280))

        def body(state):
            i, acc = state
            pos = jnp.minimum(start + i, n - 1)
            idx = jnp.take_along_axis(
                perm, pos.reshape(W, nb).astype(jnp.uint32), axis=1
            ).reshape(lanes)
            rows = jnp.take(table, idx, axis=0)
            rf = rows.astype(jnp.float32).T
            return i + 1, acc + rf[:KR]

        _, acc = jax.lax.while_loop(
            lambda s: s[0] < max_len, body, (jnp.int32(0), jnp.zeros((KR, lanes), jnp.float32))
        )
        return acc

    t_gather = timeit(gather_only, table, digits_t)

    # madd-only: no gather, fixed rows, same trip count (~280)
    @jax.jit
    def madd_only(table, digits_t):
        rf0 = jnp.zeros((2 * KR + 1, lanes), jnp.float32)
        one_col = jnp.asarray(plan.pc.pf.ONE_MONT_COL)
        acc = plan.identity_planes(lanes)
        mask = jnp.ones((1, lanes), jnp.float32)

        def body(state):
            i, aX, aY, aZ = state
            g = (rf0[:KR], rf0[KR : 2 * KR], rf0[2 * KR : 2 * KR + 1] * one_col)
            return i + 1, *plan.madd(aX, aY, aZ, *g, mask)

        _, x, y, z = jax.lax.while_loop(
            lambda s: s[0] < 280, body, (jnp.int32(0), *acc)
        )
        return x

    t_madd = timeit(madd_only, table, digits_t)

    print(
        {
            "t_full_s": round(t_full, 3),
            "t_gather_only_s": round(t_gather, 3),
            "t_madd_only_s": round(t_madd, 3),
            "madd_ms_per_step": round(t_madd / 280 * 1e3, 3),
            "gather_ms_per_step": round(t_gather / 280 * 1e3, 3),
        }
    )


if __name__ == "__main__":
    main()
