"""Microbench: XLA row-gather cost on the real chip (slope-fitted).

Per the verify skill: the axon tunnel fakes out per-op timing, and
block_until_ready may return before device work completes. So: chain K
DEPENDENT gathers inside one jit, force a small readback via np.asarray,
and fit the slope between two K values. Each link feeds the previous
gather's bytes back into the next index computation so XLA cannot
reorder/elide links.
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

    n_table = 1 << 21
    key = jax.random.PRNGKey(0)

    def slope(make_fn, k_lo=4, k_hi=16, iters=3):
        f_lo, args = make_fn(k_lo)
        f_hi, _ = make_fn(k_hi)
        np.asarray(f_lo(*args))  # compile
        np.asarray(f_hi(*args))

        def t(f):
            t0 = time.time()
            for _ in range(iters):
                np.asarray(f(*args))
            return (time.time() - t0) / iters

        t_lo, t_hi = t(f_lo), t(f_hi)
        return (t_hi - t_lo) / (k_hi - k_lo), t_lo, t_hi

    results = []
    for width, dtype, name in [
        (72, jnp.uint8, "u8x72"),
        (8, jnp.uint8, "u8x8"),
        (144, jnp.uint8, "u8x144"),
        (18, jnp.float32, "f32x18"),
    ]:
        for logm in (17, 20):
            m = 1 << logm

            def make(k, width=width, dtype=dtype, m=m):
                table = jnp.arange(n_table * width, dtype=jnp.int32).reshape(
                    n_table, width
                ).astype(dtype)
                idx0 = jax.random.randint(key, (m,), 0, n_table, jnp.int32)

                @jax.jit
                def f(table, idx0):
                    idx = idx0
                    acc = jnp.zeros((width,), jnp.int32)
                    for _ in range(k):
                        rows = jnp.take(table, idx, axis=0)  # (m, width)
                        acc = acc + rows[0].astype(jnp.int32)
                        # feed gathered data into the next indices
                        idx = (idx + rows[:, 0].astype(jnp.int32)) % n_table
                    return acc

                return f, (table, idx0)

            s, t_lo, t_hi = slope(make)
            results.append(
                dict(kind=name, m=m, ns_per_row=round(s / m * 1e9, 2),
                     ms_per_gather=round(s * 1e3, 3))
            )
            print(results[-1], flush=True)

    # lane-axis gather on plane-major f32 (34, N): rows fixed, gather lanes
    for rows in (34,):
        m = 1 << 17

        def make(k, rows=rows, m=m):
            table = jnp.ones((rows, n_table), jnp.float32)
            idx0 = jax.random.randint(key, (m,), 0, n_table, jnp.int32)

            @jax.jit
            def f(table, idx0):
                idx = idx0
                acc = jnp.zeros((rows,), jnp.float32)
                for _ in range(k):
                    cols = jnp.take(table, idx, axis=1)  # (rows, m)
                    acc = acc + cols[:, 0]
                    idx = (idx + cols[0].astype(jnp.int32)) % n_table
                return acc

            return f, (table, idx0)

        s, t_lo, t_hi = slope(make)
        print(dict(kind=f"lane_f32x{rows}", m=m,
                   ns_per_idx=round(s / m * 1e9, 2)), flush=True)


if __name__ == "__main__":
    main()
