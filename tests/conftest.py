"""Test config: force JAX onto a virtual 8-device CPU mesh.

Tests never touch the real TPU; device-semantics are identical under XLA:CPU,
and an 8-device virtual platform lets sharding tests exercise real meshes
(SURVEY.md §4: multi-host tests simulated via host_platform_device_count).
"""

import os
import sys

# Must be set before jax is imported anywhere. Hard override: the ambient
# environment points JAX_PLATFORMS at the real TPU tunnel (and a
# sitecustomize registers that backend at interpreter startup), which is
# wrong — and pathologically slow — for eager per-op test dispatch.
os.environ["JAX_PLATFORMS"] = "cpu"
# The f32-digit field is the TPU production path (fastest by ~540x there),
# but its larger XLA graphs compile slowly on this 2-vCPU test box. The
# kernels are generic over the field implementation, so the CPU suite runs
# them over the uint32 field; f32 correctness is covered by its unit tests
# + the subprocess integration test (test_f32_integration.py).
os.environ.setdefault("SNARK_TPU_FIELD_IMPL", "u32")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 shard programs time-share 2 vCPUs: the default 20s/40s in-process
    # collective rendezvous watchdog can kill the process when shards
    # arrive minutes apart (emulation skew, not a hang)
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: this box has 2 vCPUs and XLA compiles of the
# big-graph kernels (G2 MSM etc.) dominate test wall-clock. Cache survives
# across pytest runs.
# NOTE: deliberately a different directory from the TPU scripts' .jax_cache —
# concurrent readers/writers of one cache dir have segfaulted in
# zstd/cache-entry deserialization when a TPU bench ran alongside pytest.
_cache_dir = os.environ.get("SNARK_TPU_TEST_CACHE") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
