"""Device mesh and sharding: the explicit communication layer.

The reference's only parallelism is single-host ``nn.DataParallel``
(reference face.py:56, NCCL scatter/gather underneath). Here parallelism is
first-class and declarative: a ``jax.sharding.Mesh`` with ``data`` and
``model`` axes, ``NamedSharding`` annotations on frame batches and parameters,
and XLA-inserted collectives over ICI. See SURVEY.md §2 "Parallelism &
communication inventory" for the mapping.
"""

from video_desensitization_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    data_parallel_program,
    distributed_init,
    replicated,
    shard_batch,
    shard_batch_multihost,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "data_parallel_program",
    "distributed_init",
    "replicated",
    "shard_batch",
    "shard_batch_multihost",
    "shard_params",
]
