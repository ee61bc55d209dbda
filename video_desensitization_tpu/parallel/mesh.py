"""Device mesh construction and sharding helpers.

Design (TPU-first, scaling-book recipe): pick a mesh, annotate shardings on
program inputs/outputs, let XLA insert the collectives.

* ``data`` axis — shards the frame/batch dimension. Detection frames are
  independent (the video timeline is embarrassingly parallel), so inference
  scales linearly over ICI with zero cross-chip traffic; only training
  gradients all-reduce over this axis.
* ``model`` axis — optional tensor-parallel axis sharding conv channels of
  the detector for latency mode; defaults to size 1 (the models fit
  comfortably on one chip).

Frames ride host->HBM as uint8 and are sharded batch-wise at transfer time
(``shard_batch``), giving per-chip DMA streams instead of a replicated blob.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data`` defaults to n_devices // model. Device order follows
    ``jax.devices()`` which already enumerates ICI-adjacent chips contiguously
    on TPU slices, keeping the data axis on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard dim 0 (batch/frames) over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch-major arrays sharded over ``data``."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (inference default).

    With a >1 ``model`` axis a partition rule set would go here; detection
    nets are small enough that replication is the bandwidth-optimal choice.
    """
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), params)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host (multi-process) JAX for a pod slice.

    On Cloud TPU pods every argument is auto-discovered from the metadata
    server, so hosts just call ``distributed_init()``; elsewhere pass the
    coordinator explicitly. After this, ``jax.devices()`` is the GLOBAL
    device list and ``make_mesh()`` spans the whole slice — the data axis
    rides ICI within a slice and DCN across slices, ordered by
    ``jax.devices()`` enumeration. No-op when already initialized.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized — idempotent entry point
        # jax 0.9 raises "distributed.initialize should only be called once.";
        # older/newer versions phrase it with "already initialized".
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def shard_batch_multihost(mesh: Mesh, batch):
    """Assemble a global batch from per-process local data.

    Multi-host analog of ``shard_batch``: each host passes ONLY the frames
    for its own chips (global batch = concat over processes in process
    order), and ``jax.make_array_from_process_local_data`` builds the global
    sharded Array without any cross-host transfer — each host's frames DMA
    straight to its local chips. Single-process it degenerates to
    ``shard_batch`` exactly.
    """
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(x)), np.asarray(x)
        ),
        batch,
    )


def data_parallel_program(mesh: Mesh, fn, n_params: int, n_batch_args: int, n_out: int):
    """Wrap ``fn(params..., batch_arrays...)`` in ``shard_map`` over ``data``.

    The first ``n_params`` args (parameter pytrees) are replicated; the
    remaining ``n_batch_args`` args and all ``n_out`` outputs are sharded on
    dim 0. Because each device runs the whole per-shard program locally, the
    compiled inference HLO is collective-free by construction — under plain
    GSPMD propagation the TopK custom-call has no batch partitioning rule and
    the partitioner falls back to an all-gather of the batch around it.
    """
    in_specs = tuple([P()] * n_params + [P("data")] * n_batch_args)
    out_specs = tuple([P("data")] * n_out)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def pad_batch_to_devices(batch: np.ndarray, n: int):
    """Pad dim 0 to a multiple of ``n``; returns (padded, original_len)."""
    b = batch.shape[0]
    rem = (-b) % n
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b
