"""Sharded training step (pjit over a (data, model) mesh).

Sharding layout:
* batch (frames + targets) sharded over ``data`` — gradient all-reduce is the
  only cross-chip traffic, inserted by XLA from the output sharding.
* large conv kernels sharded over ``model`` on the output-channel axis
  (tensor parallelism for the channel-heavy resnet50/FPN convs); small
  params replicated. XLA inserts the all-gathers where needed.
* batch-norm batch statistics are computed over the global logical batch
  (jit sees one logical array, so no explicit axis reduction is needed).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_desensitization_tpu.models.retinaface import RetinaFace
from video_desensitization_tpu.train.losses import multibox_loss

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def param_partition_spec(path: Tuple, leaf, min_shard_channels: int = 256) -> P:
    """Shard big conv kernels over 'model' on the output-channel axis."""
    if (
        hasattr(leaf, "ndim")
        and leaf.ndim == 4
        and leaf.shape[-1] >= min_shard_channels
    ):
        return P(None, None, None, "model")
    return P()


def make_sharding_rules(mesh: Mesh, tree) -> Any:
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        if model_size > 1 and hasattr(leaf, "shape"):
            s = param_partition_spec(path, leaf)
            if s != P() and leaf.shape[-1] % model_size == 0:
                return NamedSharding(mesh, s)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def create_train_state(
    model: RetinaFace,
    rng: jax.Array,
    input_hw: Tuple[int, int],
    tx: Optional[optax.GradientTransformation] = None,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    if tx is None:
        tx = optax.sgd(1e-3, momentum=0.9)
    dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    if mesh is not None:
        shardings = TrainState(
            params=make_sharding_rules(mesh, params),
            batch_stats=jax.tree.map(
                lambda _: NamedSharding(mesh, P()), batch_stats
            ),
            opt_state=jax.tree.map(
                lambda x: NamedSharding(mesh, P()), state.opt_state
            ),
            step=NamedSharding(mesh, P()),
        )
        state = jax.device_put(state, shardings)
    return state, tx


def make_eval_step(
    model: RetinaFace,
    mesh: Optional[Mesh] = None,
    loc_weight: float = 2.0,
) -> Callable:
    """Returns a jitted eval_step(state, batch) -> metrics (no grad, BN in
    inference mode, state NOT donated). Same multibox objective as training,
    for validation-loss tracking."""

    def eval_step(state: TrainState, batch: Dict[str, Array]):
        loc, cls, landm = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"],
            train=False,
        )
        _, metrics = multibox_loss(
            loc.astype(jnp.float32),
            cls.astype(jnp.float32),
            landm.astype(jnp.float32),
            batch["loc_t"],
            batch["landm_t"],
            batch["labels"],
            loc_weight=loc_weight,
        )
        return metrics

    if mesh is None:
        return jax.jit(eval_step)

    batch_sh = NamedSharding(mesh, P("data"))

    def sharded_eval(state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_sh, batch)
        )
        return eval_step(state, batch)

    return jax.jit(sharded_eval)


def make_train_step(
    model: RetinaFace,
    tx: optax.GradientTransformation,
    anchors: np.ndarray,
    mesh: Optional[Mesh] = None,
    loc_weight: float = 2.0,
) -> Callable:
    """Returns a jitted train_step(state, batch) -> (state, metrics).

    batch = {"images": (B, H, W, 3) float32, "loc_t": (B, A, 4),
             "landm_t": (B, A, 10), "labels": (B, A) int32}

    The passed-in ``state`` is DONATED: its device buffers are reused for
    the returned state, so it must not be read after the call (standard
    train-loop contract — rebind ``state = step(state, batch)[0]``).
    Reading a donated state raises on TPU; CPU ignores donation, so test
    code that violates this only fails in deployment.
    """
    # Targets arrive pre-encoded against these anchors (train.targets);
    # the loss itself needs no anchor math.
    del anchors

    def loss_fn(params, batch_stats, batch):
        (loc, cls, landm), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
        )
        total, metrics = multibox_loss(
            loc.astype(jnp.float32),
            cls.astype(jnp.float32),
            landm.astype(jnp.float32),
            batch["loc_t"],
            batch["landm_t"],
            batch["labels"],
            loc_weight=loc_weight,
        )
        return total, (metrics, mut["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, Array]):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    # donate_argnums=(0,): the old TrainState's buffers are reused for the
    # new one — without this every step holds params+opt_state twice in HBM.
    # (Standard train-step contract: the passed-in state must not be used
    # after the call; the loop reassigns it. CPU ignores donation.)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    batch_sh = NamedSharding(mesh, P("data"))

    def sharded_step(state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_sh, batch)
        )
        return train_step(state, batch)

    return jax.jit(sharded_step, donate_argnums=(0,))
