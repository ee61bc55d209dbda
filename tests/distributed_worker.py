"""Subprocess target for the TRUE multi-process distributed test.

Two modes:

* ``--mode reference`` — single process, 8 virtual CPU devices, plain
  ``shard_batch``; saves the post-step params/metrics/inference outputs to
  ``--out`` (npz).
* ``--mode worker`` — one of N processes, 4 virtual CPU devices each, real
  ``jax.distributed.initialize`` against a localhost coordinator; feeds ONLY
  its local half of the global batch through ``shard_batch_multihost``, runs
  the same sharded train step + shard_mapped inference over the GLOBAL
  8-device mesh, allgathers results, and (process 0) compares to the
  reference npz — exit 0 iff equal.

This exercises the non-degenerate path of parallel/mesh.py
(distributed_init, shard_batch_multihost, data_parallel_program,
make_train_step's with_sharding_constraint) that the in-suite tests can only
run at process_count == 1. Reference analog: nn.DataParallel at pod scale
(reference detect_face/face.py:56).

Env (set by the launching test): JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<4|8>.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("reference", "worker"), required=True)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", default="127.0.0.1:0")
    p.add_argument("--ref", default="", help="reference npz (worker 0 compares)")
    p.add_argument("--out", default="", help="npz output path (reference mode)")
    args = p.parse_args(argv)

    import numpy as np
    import jax

    # This environment pre-imports jax at interpreter start (TPU plugin
    # registration) but backend init is lazy, so config overrides still work
    # here (same mechanism as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", 4 if args.mode == "worker" else 8
    )
    jax.config.update("jax_default_matmul_precision", "float32")

    import jax.numpy as jnp
    import optax

    from video_desensitization_tpu.models.configs import cfg_mnet
    from video_desensitization_tpu.models.retinaface import RetinaFace
    from video_desensitization_tpu.ops.anchors import generate_anchors, num_anchors
    from video_desensitization_tpu.parallel.mesh import (
        data_parallel_program,
        distributed_init,
        make_mesh,
        shard_batch,
        shard_batch_multihost,
        shard_params,
    )
    from video_desensitization_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    if args.mode == "worker":
        distributed_init(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes, jax.process_count()
        assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh()

    # ---- identical model/state in every process (deterministic PRNG) ----
    hw = (64, 64)
    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    tx = optax.sgd(1e-2)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), hw, tx, mesh=mesh)
    anchors = generate_anchors(
        hw, min_sizes=cfg_mnet["min_sizes"], steps=cfg_mnet["steps"]
    )
    a = num_anchors(hw, steps=cfg_mnet["steps"])

    # ---- deterministic GLOBAL batch; workers slice their local shard ----
    rng = np.random.default_rng(42)
    gb = 8
    global_batch = {
        "images": rng.normal(0, 1, (gb, *hw, 3)).astype(np.float32),
        "loc_t": rng.normal(0, 0.1, (gb, a, 4)).astype(np.float32),
        "landm_t": rng.normal(0, 0.1, (gb, a, 10)).astype(np.float32),
        "labels": rng.integers(0, 2, (gb, a)).astype(np.int32),
    }
    if args.mode == "worker":
        per = gb // args.num_processes
        lo = args.process_id * per
        local = {k: v[lo : lo + per] for k, v in global_batch.items()}
        batch = shard_batch_multihost(mesh, local)
    else:
        batch = shard_batch(mesh, global_batch)

    # ---- one sharded train step (gradient all-reduce over data) ----
    step = make_train_step(model, tx, anchors, mesh=mesh)
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    # params stay fully replicated -> every process can fetch them whole
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    param_sample = {
        jax.tree_util.keystr(k): np.asarray(v) for k, v in flat[:4] + flat[-4:]
    }

    # ---- shard_mapped inference over the global mesh ----
    eval_model = RetinaFace(cfg=cfg_mnet, mode="eval", dtype=jnp.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = shard_params(mesh, variables)

    def fwd(vs, images):
        return eval_model.apply(vs, images)

    prog = jax.jit(
        data_parallel_program(mesh, fwd, n_params=1, n_batch_args=1, n_out=3)
    )
    if args.mode == "worker":
        imgs = shard_batch_multihost(
            mesh, global_batch["images"][lo : lo + per]
        )
    else:
        imgs = shard_batch(mesh, global_batch["images"])
    bbox, cls, landm = prog(variables, imgs)

    if args.mode == "worker":
        from jax.experimental import multihost_utils

        bbox = multihost_utils.process_allgather(bbox, tiled=True)
        cls = multihost_utils.process_allgather(cls, tiled=True)
        landm = multihost_utils.process_allgather(landm, tiled=True)
    result = {
        "loss": np.float32(loss),
        "bbox": np.asarray(bbox),
        "cls": np.asarray(cls),
        "landm": np.asarray(landm),
        **{f"param:{k}": v for k, v in param_sample.items()},
    }

    if args.mode == "reference":
        np.savez(args.out, **result)
        print(f"reference written: loss={loss:.6f}")
        return 0

    rc = 0
    if args.process_id == 0:
        ref = np.load(args.ref)
        for k in ref.files:
            try:
                # Cross-process collectives (Gloo) may sum in a different
                # order than the single-process XLA all-reduce; 1e-3 bounds
                # that float non-determinism while still catching any real
                # sharding/slicing mistake (which shifts whole frames).
                np.testing.assert_allclose(
                    result[k], ref[k], rtol=1e-3, atol=1e-4, err_msg=k
                )
            except AssertionError as e:
                print(e)
                rc = 1
        print(f"worker0 compare {'FAILED' if rc else 'ok'}: loss={loss:.6f}")
    # every process participates in the final barrier implicitly via
    # process_allgather above; exit codes are collected by the test harness
    return rc


if __name__ == "__main__":
    sys.exit(main())
