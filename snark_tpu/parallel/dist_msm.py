"""MSM partitioned over a mesh axis (the "tp" analogue, SURVEY.md §2.2).

Bases and scalar digits are sharded over chips; every chip runs the full
bucket pipeline on its shard (ops/msm.py), then the single-point partial
results ride the ICI via all_gather and every chip folds them with a local
point-add loop. Communication volume: one (3, K) point per chip — nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve import _CurveOpsBase
from ..ops.msm import MsmPlan, pick_window


def sharded_msm(
    ops: _CurveOpsBase,
    mesh: Mesh,
    axis: str,
    points: jnp.ndarray,
    digits: jnp.ndarray,
    c: int | None = None,
) -> jnp.ndarray:
    """Σ s_i · P_i with (points, digits) sharded along `axis`.

    points (N, 3, K), digits (N, W); N must divide evenly by the axis size.
    Returns the replicated (3, K) total.
    """
    n_local = points.shape[0] // mesh.shape[axis]
    c = c or pick_window(max(n_local, 2))
    plan = MsmPlan(ops, c)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # result is replicated by construction (all_gather + local fold)
    )
    def run(pts, dgs):
        local = plan._msm_impl(pts, dgs)  # (3, K) partial on this chip
        gathered = jax.lax.all_gather(local, axis)  # (ndev, 3, K)

        def body(i, acc):
            return ops.add_impl(acc, gathered[i])

        acc0 = ops.IDENTITY + gathered[0] * 0  # match shard_map varying axes
        return jax.lax.fori_loop(0, gathered.shape[0], body, acc0)

    return jax.jit(run)(points, digits)
