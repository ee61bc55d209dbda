"""Training driver CLI — closes the train loop the reference lacks.

The reference is inference-only: weights arrive pre-trained out-of-band
(reference face.py:50-58 torch.load, README.md:24-26 Baidu link). A complete
framework must be able to (re)produce those checkpoints, so this driver ties
the training stack together end to end:

    label.txt + images  ->  batch_iterator (letterbox + anchor matching)
                        ->  sharded train step (dp/tp over a (data, model) mesh)
                        ->  orbax TrainState checkpoints (resume-able)
                        ->  msgpack inference export (loads into detect.face.Retinaface)

Usage:

    python -m video_desensitization_tpu.cli.train \
        --labels data/widerface/train/label.txt \
        --images data/widerface/train/images \
        --backbone resnet50 --epochs 100 --batch-size 32 \
        --ckpt-dir ckpts/ --export retinaface_tpu.msgpack

Defaults follow the classic RetinaFace recipe: SGD momentum 0.9, weight
decay 5e-4, base lr 1e-3 with x0.1 decays at epoch milestones and a linear
warmup. Everything runs on the current JAX backend; pass --mesh-data /
--mesh-model to shard over multiple chips (gradients all-reduce over
``data``; large conv kernels shard over ``model``).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train RetinaFace on TPU")
    p.add_argument("--labels", required=True, help="retinaface-style label.txt")
    p.add_argument("--images", required=True, help="image root the label paths are relative to")
    p.add_argument("--backbone", default="resnet50", choices=["resnet50", "mobilenet"])
    p.add_argument("--input-size", type=int, default=640, help="square train resolution")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-gt", type=int, default=64, help="ground-truth pad count per image")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--gamma", type=float, default=0.1, help="lr decay factor at milestones")
    p.add_argument(
        "--milestones",
        default="70,90",
        help="comma-separated EPOCH numbers where lr decays by --gamma",
    )
    p.add_argument("--warmup-epochs", type=float, default=1.0)
    p.add_argument(
        "--compute-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="forward/backward compute dtype; params, optimizer state, and "
        "the loss stay float32 (bfloat16 runs the convs at the MXU's native "
        "rate — ~2x step throughput on TPU)",
    )
    p.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel axis size (0 = all devices / mesh-model; "
                   "1 = single device, no mesh)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size for large conv kernels")
    p.add_argument("--ckpt-dir", default=None, help="orbax checkpoint directory")
    p.add_argument("--save-every", type=int, default=1, help="checkpoint every N epochs")
    p.add_argument("--resume", default=None, help="orbax checkpoint path to resume from")
    p.add_argument("--export", default=None,
                   help="write final weights as a msgpack the Retinaface wrapper loads")
    p.add_argument("--log-every", type=int, default=10, help="log metrics every N steps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--val-frac",
        type=float,
        default=0.0,
        help="hold out this fraction of images (deterministic split) and "
        "report validation multibox loss after every epoch",
    )
    return p.parse_args(argv)


def build_optimizer(args, steps_per_epoch: int):
    import optax

    from video_desensitization_tpu.train.data import multistep_lr

    milestones = [
        int(round(float(m) * steps_per_epoch))
        for m in str(args.milestones).split(",")
        if str(m).strip()
    ]
    schedule = multistep_lr(
        args.lr,
        milestones,
        gamma=args.gamma,
        warmup_steps=int(round(args.warmup_epochs * steps_per_epoch)),
    )
    tx = optax.sgd(schedule, momentum=args.momentum)
    if args.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(args.weight_decay), tx)
    return tx, schedule


def train(args: argparse.Namespace):
    """Run the training loop; returns the final TrainState."""
    import jax
    import jax.numpy as jnp

    from video_desensitization_tpu.models.configs import cfg_mnet, cfg_re50
    from video_desensitization_tpu.models.retinaface import RetinaFace
    from video_desensitization_tpu.ops.anchors import generate_anchors
    from video_desensitization_tpu.parallel.mesh import make_mesh, shard_batch
    from video_desensitization_tpu.train.checkpoint import (
        export_inference_variables,
        restore_train_state,
        save_train_state,
    )
    from video_desensitization_tpu.train.data import batch_iterator, load_retinaface_labels
    from video_desensitization_tpu.train.step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from video_desensitization_tpu.utils.logging import get_logger

    log = get_logger("train")
    hw = (args.input_size, args.input_size)
    cfg = cfg_re50 if args.backbone == "resnet50" else cfg_mnet

    labels = load_retinaface_labels(args.labels)
    if not labels:
        raise ValueError(f"no annotations parsed from {args.labels}")
    val_labels: dict = {}
    if args.val_frac > 0:
        keys = sorted(labels)
        n_val = max(1, int(round(len(keys) * args.val_frac)))
        if n_val >= len(keys):
            raise ValueError(f"--val-frac {args.val_frac} leaves no train data")
        val_keys = set(
            np.random.default_rng(args.seed).choice(
                keys, size=n_val, replace=False
            ).tolist()
        )
        val_labels = {k: labels[k] for k in val_keys}
        labels = {k: v for k, v in labels.items() if k not in val_keys}
        if len(val_labels) < args.batch_size:
            log.warning(
                "validation split (%d images) smaller than one batch (%d) — "
                "validation will be skipped (shape-static batches only)",
                len(val_labels), args.batch_size,
            )
    steps_per_epoch = max(1, len(labels) // args.batch_size)
    log.info(
        "%d annotated images | %d steps/epoch @ batch %d | input %dx%d (%s)",
        len(labels), steps_per_epoch, args.batch_size, *hw, args.backbone,
    )

    mesh = None
    n_dev = len(jax.devices())
    if args.mesh_data == 0 and (n_dev > 1 or args.mesh_model > 1):
        mesh = make_mesh(model=args.mesh_model)
    elif args.mesh_data > 1 or args.mesh_model > 1:
        mesh = make_mesh(
            jax.devices()[: args.mesh_data * args.mesh_model],
            data=max(1, args.mesh_data),
            model=args.mesh_model,
        )
    if mesh is not None:
        log.info("mesh: %s", dict(mesh.shape))
        if args.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch {args.batch_size} not divisible by data axis "
                f"{mesh.shape['data']}"
            )

    # Compute dtype only: Flax keeps param_dtype float32, and the train step
    # casts head outputs to f32 before the loss (train/step.py loss_fn), so
    # bfloat16 here is pure mixed-precision — master weights stay exact.
    model = RetinaFace(
        cfg=cfg,
        mode="train",
        dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )
    tx, schedule = build_optimizer(args, steps_per_epoch)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(args.seed), hw, tx, mesh=mesh
    )
    if args.resume:
        state = restore_train_state(args.resume, state, mesh=mesh)
        log.info("resumed from %s at step %d", args.resume, int(state.step))

    anchors = generate_anchors(
        hw, min_sizes=cfg["min_sizes"], steps=cfg["steps"]
    )
    step_fn = make_train_step(model, tx, anchors, mesh=mesh)
    eval_fn = make_eval_step(model, mesh=mesh) if val_labels else None

    def run_validation(state, epoch):
        n, tot = 0, 0.0
        for vb in batch_iterator(
            val_labels, args.images, hw, anchors,
            batch_size=args.batch_size, max_gt=args.max_gt,
            shuffle=False, drop_remainder=True,
        ):
            if mesh is not None:
                vb = shard_batch(mesh, vb)
            m = eval_fn(state, vb)
            tot += float(m["loss"])
            n += 1
        if n:
            log.info("epoch %d validation: loss %.4f over %d batches",
                     epoch, tot / n, n)
            return tot / n
        return None

    start_step = int(state.step)
    total_steps = args.epochs * steps_per_epoch
    start_epoch = start_step // steps_per_epoch
    t_start = time.time()
    metrics = {}
    for epoch in range(start_epoch, args.epochs):
        it = batch_iterator(
            labels,
            args.images,
            hw,
            anchors,
            batch_size=args.batch_size,
            max_gt=args.max_gt,
            shuffle=True,
            seed=args.seed + epoch,
        )
        t_ep = time.time()
        n_steps = 0
        for batch in it:
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch)
            n_steps += 1
            gstep = int(state.step)
            if gstep % args.log_every == 0 or n_steps == 1:
                m = {k: float(v) for k, v in metrics.items()}
                log.info(
                    "epoch %d step %d/%d lr %.2e | loss %.4f (loc %.4f cls %.4f landm %.4f)",
                    epoch, gstep, total_steps, float(schedule(gstep)),
                    m.get("loss", float("nan")), m.get("loss_loc", float("nan")),
                    m.get("loss_cls", float("nan")), m.get("loss_landm", float("nan")),
                )
        dt = time.time() - t_ep
        log.info(
            "epoch %d done: %d steps in %.1fs (%.2f img/s)",
            epoch, n_steps, dt, n_steps * args.batch_size / max(dt, 1e-9),
        )
        if eval_fn is not None:
            run_validation(state, epoch)
        if args.ckpt_dir and ((epoch + 1) % args.save_every == 0 or epoch + 1 == args.epochs):
            path = os.path.join(args.ckpt_dir, f"ep{epoch + 1:04d}")
            save_train_state(path, state)
            log.info("checkpoint: %s", path)

    if metrics:
        loss = float(metrics.get("loss", np.nan))
        if not np.isfinite(loss):
            raise RuntimeError(f"training diverged: final loss {loss}")
    log.info("training done in %.1fs (%d steps)", time.time() - t_start, int(state.step))

    if args.export:
        export_inference_variables(args.export, state)
        log.info("inference weights exported: %s", args.export)
    return state


def main(argv=None) -> int:
    from video_desensitization_tpu.utils.logging import setup_logger

    setup_logger()
    train(parse_args(argv))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
