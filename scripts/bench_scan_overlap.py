"""Does software-pipelining the bucket scan overlap gather with madd?

Variants (all: while-loop over S steps, 81920 lanes, real madd kernel):
  nogather — madd on fixed planes (compute floor)
  dep      — gather -> madd, dependent (current msm_plane shape)
  pipe     — body computes madd(acc, G_prev) and gathers G_next
             (independent ops; if XLA overlaps DMA-gather with the
             pallas_call, per-step ~= max(gather, madd) not sum)
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
    from snark_tpu.ops.msm_plane import get_plane_msm

    plan = get_plane_msm(BN254, 13, signed=True)
    pc = plan.pc
    KR = pc.R8
    lanes = 81920
    n_table = 1 << 21
    S = 64

    table = jnp.zeros((n_table, 2 * KR + 1), jnp.uint8)
    key = jax.random.PRNGKey(0)
    idxs = jax.random.randint(key, (S, lanes), 0, n_table, jnp.int32)
    one_col = jnp.asarray(pc.pf.ONE_MONT_COL)

    acc0 = plan.identity_planes(lanes)
    mask = jnp.ones((1, lanes), jnp.float32)

    def decode(rows):
        rf = rows.astype(jnp.float32).T
        return rf[:KR], rf[KR : 2 * KR], rf[2 * KR : 2 * KR + 1] * one_col

    @jax.jit
    def nogather(acc0, g):
        def body(i, acc):
            return plan.madd(*acc, *g, mask)

        return jax.lax.fori_loop(0, S, body, acc0)

    @jax.jit
    def dep(acc0, table, idxs):
        def body(i, acc):
            rows = jnp.take(table, idxs[i], axis=0)
            return plan.madd(*acc, *decode(rows), mask)

        return jax.lax.fori_loop(0, S, body, acc0)

    @jax.jit
    def pipe(acc0, table, idxs):
        g0 = jnp.take(table, idxs[0], axis=0)

        def body(i, state):
            acc, g = state
            g_next = jnp.take(table, idxs[jnp.minimum(i + 1, S - 1)], axis=0)
            acc = plan.madd(*acc, *decode(g), mask)
            return acc, g_next

        acc, _ = jax.lax.fori_loop(0, S, body, (acc0, g0))
        return acc

    g_fixed = decode(jnp.take(table, idxs[0], axis=0))

    def t(f, *a, iters=3):
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.time() - t0) / iters

    t_ng = t(nogather, acc0, g_fixed)
    t_dep = t(dep, acc0, table, idxs)
    t_pipe = t(pipe, acc0, table, idxs)
    print(
        {
            "lanes": lanes,
            "steps": S,
            "madd_only_ms_per_step": round(t_ng / S * 1e3, 3),
            "dep_ms_per_step": round(t_dep / S * 1e3, 3),
            "pipe_ms_per_step": round(t_pipe / S * 1e3, 3),
            "gather_tax_dep_ms": round((t_dep - t_ng) / S * 1e3, 3),
            "gather_tax_pipe_ms": round((t_pipe - t_ng) / S * 1e3, 3),
        }
    )


if __name__ == "__main__":
    main()
