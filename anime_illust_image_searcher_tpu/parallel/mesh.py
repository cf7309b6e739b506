"""Device mesh construction and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.3); scaling here is pjit
over a ``(data, model)`` mesh: batches and index rows shard over ``data``; ``model`` is
reserved for tensor-parallel layouts if a larger tagger is ever swapped in. Collectives
(psum/all-gather for the top-k merge) are emitted by XLA from the shardings — there is
no hand-written NCCL/MPI analog to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_model < 1:
        raise ValueError(
            f"mesh needs n_data>=1 and n_model>=1, got n_data={n_data}, "
            f"n_model={n_model} over {len(devices)} devices")
    wanted = n_data * n_model
    if wanted > len(devices):
        raise ValueError(
            f"mesh wants {n_data}x{n_model}={wanted} devices, "
            f"only {len(devices)} available")
    if wanted < len(devices):
        # an indivisible split idles hardware — that's a silent throughput
        # loss the operator should see, not discover in a profile
        print(f"make_mesh: using {wanted} of {len(devices)} devices "
              f"({len(devices) - wanted} idle; pick n_model dividing the count)")
    grid = np.array(devices[:wanted]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / document) axis over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Place a host batch onto the mesh, split over the data axis (the pjit analog of
    the reference's single-device .to(device) — tagging.py:172)."""
    return jax.device_put(batch, data_sharding(mesh))


def put_global(arr, sharding: NamedSharding) -> jax.Array:
    """Place a host array onto a mesh that may span multiple processes.

    Single-process meshes take the fast ``jax.device_put`` path. Across processes
    (multi-host pod slices), ``device_put`` can't address remote shards, so the
    global array is assembled per-process with ``make_array_from_callback`` — every
    process holds the full host array (artifacts load from shared storage) and
    contributes only its addressable shards. SPMD callers then run one jit over the
    global array; XLA routes the collectives over ICI/DCN (SURVEY.md §2.3)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    np_arr = np.asarray(arr)
    return jax.make_array_from_callback(
        np_arr.shape, sharding, lambda idx: np_arr[idx])


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad the leading axis so it divides the data-axis size (static shapes for XLA)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(arr), widths), n
