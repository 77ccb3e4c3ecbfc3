"""Stage-level timing of the batch-affine MSM pipeline on the TPU.

Times, at the real 2^20/c=13 level-0 shapes: the row gather, phase1,
one pallas tree mul, the full batch inversion, phase3, and the whole
accumulate, each warmed and synced.
"""

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
from snark_tpu.ops.msm_affine import _get_kernels, batch_inverse_planes
from snark_tpu.ops.pallas_curve import get_plane_curve, rows_pad_width


def _sync(r):
    # block_until_ready does not actually block through the axon tunnel;
    # force a scalar readback of a tiny slice instead
    leaves = jax.tree_util.tree_leaves(r)
    for x in leaves:
        np.asarray(x[..., :1])
    return r


def timeit(name, fn, iters=3):
    r = _sync(fn())
    t0 = time.time()
    for _ in range(iters):
        r = _sync(fn())
    print(f"{name:28s} {(time.time() - t0) / iters * 1e3:9.1f} ms", flush=True)
    return r


def main():
    curve = BN254
    pc = get_plane_curve(curve)
    rows_w = rows_pad_width(curve, "g1")
    R8 = pc.pf.R8
    tile = 1024
    log_n = int(os.environ.get("LOG_N", "20"))
    n = 1 << log_n
    W, B0 = 20, 32
    lanes = W * 4096
    TB = -(-(W * n) // B0) + lanes
    TB = -(-TB // tile) * tile
    slots = TB * B0
    M = slots // 2
    print(f"slots={slots} M={M}")

    rng = np.random.default_rng(0)
    phase1, phase3, tree_mul = _get_kernels(curve, tile, None, "g1", True)

    table = jnp.asarray(
        rng.integers(0, 255, size=(n + 1, rows_w), dtype=np.uint8)
    )
    idx = jnp.asarray(rng.integers(0, n, size=(slots,), dtype=np.int32))

    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    rows = timeit("gather 23.6M rows", lambda: gather(table, idx))

    blk = rows.reshape(M, 2 * rows_w)
    sgn = jnp.zeros((2, M), jnp.float32)
    den_preds = timeit("phase1 @M", lambda: phase1(blk, sgn))
    den, preds = den_preds

    a = den[:, 0 : M : 2]
    b = den[:, 1 : M : 2]

    def slice_pair(d):
        return d[:, 0::2], d[:, 1::2]

    timeit("lane-stride slice x2", jax.jit(lambda d: slice_pair(d)[0]).__call__ if False else (lambda: jax.jit(lambda d: d[:, 0::2] + 0)(den)))
    timeit("tree_mul @M/2", lambda: tree_mul(a, b))

    inv_fn = jax.jit(
        lambda d: batch_inverse_planes(pc, "g1", d, tree_mul, tile)
    )
    dinv = timeit("batch_inverse @M", lambda: inv_fn(den))

    timeit("phase3 @M", lambda: phase3(blk, sgn, dinv, preds))


if __name__ == "__main__":
    main()
