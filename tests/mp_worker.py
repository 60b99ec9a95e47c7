"""Worker for the two-process `jax.distributed` smoke test.

Launched by tests/test_multiprocess.py as a subprocess (2 processes x 4
virtual CPU devices = one 8-device global mesh). Mirrors the reference's
multi-rank launch (main.py:27-34: init_process_group + --local_rank) the
TPU-native way: `jax.distributed.initialize` + a global `data` mesh; the
gradient all-reduce across processes is emitted by XLA from the sharded
jit, where the reference relies on DDP bucket hooks (lib/trainer.py:302).

Each process writes a JSON result with its post-update parameter digest
(must agree across processes — proves the cross-process collective ran),
its loader index shard (must be disjoint + covering), and whether it wrote
the checkpoint marker (only process 0 may — Trainer.is_main semantics,
train/trainer.py:49).
"""

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_index() == args.process_id
    assert jax.process_count() == args.num_processes

    import numpy as np

    from roitr_tpu.config import Config
    from roitr_tpu.data.synthetic import make_pair_inputs, stack_pairs
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.parallel import (
        batch_sharding,
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
        replicated,
    )

    cfg = Config(
        num_est_coarse_corr=8,
        num_gt_coarse_corr=8,
        point_per_patch=8,
        sinkhorn_iters=5,
        max_gt_corr_candidates=16,
    )
    bucket = 128

    # every process builds the SAME global batch deterministically, then
    # materializes only its addressable shards of the global array
    rng = np.random.RandomState(0)
    n_pairs = jax.device_count()
    pairs = [
        make_pair_inputs(rng, bucket, bucket - 8, bucket - 24, normal_k=8)
        for _ in range(n_pairs)
    ]
    batch = stack_pairs(pairs)

    mesh = make_mesh()  # all global devices
    assert mesh.devices.size == args.num_processes * jax.local_device_count()
    bsh, rep = batch_sharding(mesh), replicated(mesh)

    def put(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    gbatch = jax.tree_util.tree_map(lambda x: put(x, bsh), batch)

    model = RoITr(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, pairs[0], jax.random.PRNGKey(0), tx)
    state = jax.tree_util.tree_map(lambda x: put(x, rep), state)

    step = jax.jit(
        make_train_step(cfg, model, tx),
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
    )
    rng_key = put(np.asarray(jax.random.PRNGKey(1)), rep)
    losses = []
    for _ in range(2):
        state, metrics = step(state, gbatch, rng_key)
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))

    digest = float(
        sum(
            np.abs(np.asarray(leaf.addressable_data(0), np.float64)).sum()
            for leaf in jax.tree_util.tree_leaves(state.params)
        )
    )

    # loader striding (data/loader.py:134): this process's shard of a
    # 16-item index list, like the reference's DistributedSampler
    indices = np.arange(16)[jax.process_index() :: jax.process_count()]

    # process-0-only checkpoint guard (train/trainer.py:49-50)
    wrote_ckpt = False
    if jax.process_index() == 0:
        with open(os.path.join(args.out, "ckpt_marker"), "w") as f:
            f.write("ok")
        wrote_ckpt = True

    with open(
        os.path.join(args.out, f"result_{args.process_id}.json"), "w"
    ) as f:
        json.dump(
            {
                "process": args.process_id,
                "device_count": jax.device_count(),
                "local_device_count": jax.local_device_count(),
                "losses": losses,
                "digest": digest,
                "indices": [int(i) for i in indices],
                "wrote_ckpt": wrote_ckpt,
            },
            f,
        )


if __name__ == "__main__":
    main()
