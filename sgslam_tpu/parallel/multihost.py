"""Multi-process (multi-host) bootstrap for the distributed back end.

The reference has no distributed runtime at all (SURVEY.md §2.3 — its only
cross-process boundary is ROS pub/sub to octomap_server). Here the
multi-host path is JAX's distributed runtime: every host calls
`init_process`, the global device set forms the ('kf', 'pt') mesh, and the
same shard_map Schur-reduction programs (parallel/dist_ba) run SPMD with
psum/all_gather riding ICI within a slice and DCN between hosts.

On a CPU-only test rig the same code path runs as N OS processes with one
CPU device each and gRPC-backed collectives — the hermetic stand-in
exercised by tools/multihost_demo.py and the SCALING artifact.
"""

from __future__ import annotations

import jax


def init_process(coordinator: str, num_processes: int, process_id: int,
                 local_device_count: int | None = None):
    """Join the distributed runtime (idempotent). Call BEFORE any other
    jax API touches the backend. Returns (global_devices, local_devices).
    """
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.devices(), jax.local_devices()


def global_shard(mesh, pspec, local_data):
    """Assemble a global sharded array from this process's local slab."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), local_data)
