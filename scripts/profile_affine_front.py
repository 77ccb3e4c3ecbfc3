"""Time the affine pipeline's front (sort -> indices -> word gather ->
unpack) and its tail (block scan at TB shapes) separately, at real
2^20/c=13 shapes on the TPU."""

import os
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
from snark_tpu.ops.msm_plane import get_plane_msm
from snark_tpu.ops.msm_affine import pick_block_size


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(name, fn, iters=3):
    r = fn()
    sync(r)
    t0 = time.time()
    for _ in range(iters):
        sync(fn())
    print(f"{name:30s} {(time.time() - t0) / iters * 1e3:9.1f} ms", flush=True)


def main():
    curve = BN254
    log_n = int(os.environ.get("LOG_N", "20"))
    n = 1 << log_n
    c = 13
    plan = get_plane_msm(curve, c, signed=True)
    rng = np.random.default_rng(0)
    digits_t = jnp.asarray(
        rng.integers(-(1 << (c - 1)), 1 << (c - 1), size=(plan.W, n), dtype=np.int32)
    )
    table = jnp.asarray(
        rng.integers(0, 255, size=(n, 2 * plan.pc.R8 + 1), dtype=np.uint8)
    )

    sortf = jax.jit(lambda d: plan._sorted_buckets(table, d)[1:4])
    timeit("sort+searchsorted", lambda: sortf(digits_t))

    nb = 1 << plan.cb
    lanes = plan.W * nb
    mean = n // nb
    B0 = pick_block_size(mean)
    tile = plan.tile
    TB = -(-(plan.W * n) // B0) + lanes
    TB = -(-TB // tile) * tile
    slots = TB * B0
    print(f"B0={B0} TB={TB} slots={slots}")

    @jax.jit
    def front(d):
        table_p, perm_flat, start, length, _ = plan._sorted_buckets(table, d)
        table_s = jnp.concatenate(
            [table_p, jnp.zeros((1, table_p.shape[1]), table_p.dtype)], 0
        )
        nblk = -(-length // B0)
        boff = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)]
        )
        blk_ids = jnp.arange(TB, dtype=jnp.int32)
        b_of = jnp.clip(
            jnp.searchsorted(boff, blk_ids, side="right").astype(jnp.int32) - 1,
            0,
            lanes - 1,
        )
        base_j = (blk_ids - jnp.take(boff, b_of)) * B0
        j = base_j[:, None] + jnp.arange(B0, dtype=jnp.int32)[None, :]
        len_b = jnp.take(length, b_of)[:, None]
        in_range = (j < len_b) & (blk_ids[:, None] < boff[lanes])
        win = (b_of // nb).astype(jnp.int32)
        pos = jnp.minimum(jnp.take(start, b_of)[:, None] + jnp.minimum(j, n - 1), n - 1)
        pay = jnp.take(perm_flat, win[:, None] * n + pos)
        idx = jnp.where(
            in_range, (pay & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32), n
        )
        w = table_s.shape[1]
        w4 = w // 4
        t32 = sum(
            table_s[:, k * w4 : (k + 1) * w4].astype(jnp.uint32)
            << jnp.uint32(8 * k)
            for k in range(4)
        )
        r32 = jnp.take(t32, idx.reshape(-1), axis=0)
        rows = jnp.concatenate(
            [(r32 >> jnp.uint32(8 * k)) & jnp.uint32(0xFF) for k in range(4)],
            axis=1,
        ).astype(jnp.uint8)
        return rows

    timeit("front(sort+idx+gather)", lambda: front(digits_t))

    # tail: block scan at TB shapes (uniform ~mean/B0 blocks per bucket)
    rowsb = jnp.asarray(
        rng.integers(0, 255, size=(TB, plan.rows_w), dtype=np.uint8)
    )
    nblk_host = rng.multinomial(
        plan.W * n // B0, np.ones(lanes) / lanes
    ).astype(np.int32)
    boff_host = np.concatenate([[0], np.cumsum(nblk_host)]).astype(np.int32)

    @jax.jit
    def tail(rb):
        return plan._run_scan(
            rb,
            jnp.arange(TB, dtype=jnp.uint32),
            jnp.zeros((lanes,), jnp.int32),
            jnp.asarray(boff_host[:-1]),
            jnp.asarray(nblk_host),
            TB,
            mean_hint=max(1, mean // B0 + 1),
        )

    timeit("tail(block scan)", lambda: tail(rowsb))

    timeit(
        "full window_sums",
        lambda: plan._sums(table, digits_t),
    )


if __name__ == "__main__":
    main()
