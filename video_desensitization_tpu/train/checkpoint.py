"""Orbax checkpointing for the sharded train state.

The reference checkpoints model weights only (``torch.load``/``save`` of a
state_dict, reference face.py:50-58) — no optimizer or step state. Training
on TPU wants the full ``TrainState`` (params, batch_stats, opt_state, step)
saved atomically and restored WITH shardings, so a resumed job lands its
parameters directly on the mesh without a host round trip.

``save_train_state`` / ``restore_train_state`` wrap orbax's
StandardCheckpointer; restore takes an abstract template (from
``create_train_state`` on any backend) plus an optional mesh, and places
every leaf according to ``make_sharding_rules`` — the same layout the train
step computes with.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_desensitization_tpu.train.step import TrainState, make_sharding_rules


def export_inference_variables(path: str, state: TrainState) -> str:
    """Write a trained state's weights as a msgpack inference checkpoint.

    The output is exactly what ``detect.face.Retinaface(model_path=...)``
    loads: ``{"params": ..., "batch_stats": ...}`` via flax serialization
    (models/convert.py ``save_variables``). This is the bridge from a
    training run to the deployment pipeline — the analog of the reference's
    out-of-band ``Retinaface_resnet50.pth`` hand-off (reference face.py:53).
    """
    from video_desensitization_tpu.models.convert import save_variables

    variables = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    save_variables(variables, path)
    return os.path.abspath(path)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(path: str, state: TrainState) -> str:
    """Atomically save a TrainState (params, batch_stats, opt_state, step)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(
    path: str,
    template: TrainState,
    mesh: Optional[Mesh] = None,
) -> TrainState:
    """Restore a TrainState saved by ``save_train_state``.

    ``template`` supplies the tree structure/shapes/dtypes (build it with
    ``create_train_state`` — values are ignored). With a ``mesh``, leaves are
    restored directly into the train step's sharding layout (big conv kernels
    over ``model``, everything else replicated); without one, onto the
    default device.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    if mesh is not None:
        shardings = TrainState(
            params=make_sharding_rules(mesh, template.params),
            batch_stats=jax.tree.map(
                lambda _: NamedSharding(mesh, P()), template.batch_stats
            ),
            opt_state=jax.tree.map(
                lambda _: NamedSharding(mesh, P()), template.opt_state
            ),
            step=NamedSharding(mesh, P()),
        )
        abstract = jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                np.shape(x), jax.dtypes.result_type(x), sharding=s
            ),
            template,
            shardings,
        )
    else:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), jax.dtypes.result_type(x)),
            template,
        )
    ckptr = _checkpointer()
    return ckptr.restore(path, abstract)
