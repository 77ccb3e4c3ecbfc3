"""Mesh/sharding layer: multi-chip scaling of MSM, NTT, and batched proving.

The reference's only parallel substrate is rayon shared-memory data
parallelism (SURVEY.md §2.2); the TPU-native analogues here are:

  * dp — batched proving: independent proofs sharded over chips
  * tp — MSM: bases/scalars partitioned over chips, per-shard partial MSMs
    combined with an all_gather + local point reduction
  * sp — NTT: six-step decomposition with an all_to_all transpose between
    the two local-FFT phases

All built on jax.sharding.Mesh + shard_map with XLA collectives; no custom
transport (SURVEY.md §5 "Distributed communication backend").
"""

from .mesh import make_mesh, local_mesh
from .dist_msm import sharded_msm
from .dist_ntt import DistNttPlan
from .batch import BatchProver

__all__ = [
    "BatchProver",
    "DistNttPlan",
    "local_mesh",
    "make_mesh",
    "sharded_msm",
]
