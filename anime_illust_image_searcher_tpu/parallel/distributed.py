"""Multi-host initialization helpers (SURVEY.md §2.3, §5.8).

The reference has no distributed story at all (its "cluster" workflow is manually
copying tensor files to Colab — README.md:122-129). Here multi-host runs initialize
through ``jax.distributed`` and then use the same mesh/sharding code as single-host:
XLA emits the collectives; intra-slice traffic rides ICI, cross-slice DCN.

Typical use on each host of a pod slice:

    from anime_illust_image_searcher_tpu.parallel import distributed, mesh
    distributed.initialize()            # no-op on single-process runs
    m = mesh.make_mesh()                # spans every chip in the job
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars.

    Returns True if multi-process mode was initialized, False for single-process
    (the common laptop / single-chip case — everything still works on one device).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if not coordinator_address and num_processes in (None, 1):
        # No explicit coordinator config. On a multi-host TPU pod slice the
        # runtime sets TPU_WORKER_HOSTNAMES to the host list (this project's
        # JAX_* names are never set there) — let jax.distributed's own
        # cluster auto-detection take over, else every host would silently
        # run as an independent single-process job on a fraction of the
        # slice. Single-host markers (no comma) stay single-process.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," not in hostnames:
            return False
        import jax

        try:
            jax.distributed.initialize()  # TPU metadata auto-detection
            return True
        except Exception as e:  # noqa: BLE001 — degrade, don't crash the CLI
            print(f"distributed auto-init failed ({e}); running single-process")
            return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
