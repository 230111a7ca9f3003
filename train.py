#!/usr/bin/env python
"""Train the IMHN pose network, data-parallel over the TPU mesh.

CLI-compatible successor of the reference trainers (train.py /
train_distributed.py / train_distributed_SWA.py): one SPMD program replaces
the NCCL process-group scaffolding; pass ``--swa`` for stochastic weight
averaging. Without a COCO hdf5 dataset (``--train-h5``) a synthetic dataset
exercises the identical training path.

Example:
    python train.py --epochs 2 --steps-per-epoch 10 --batch-size 4 --image-size 256
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from improved_body_parts_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    parser = argparse.ArgumentParser(description="PoseNet Training (TPU-native)")
    parser.add_argument("--config", default="Canonical")
    parser.add_argument("--checkpoint_path", "-p", default="link2checkpoints_distributed",
                        help="checkpoint + log directory")
    parser.add_argument("--resume", "-r", action="store_true", help="resume from checkpoint")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--steps-per-epoch", type=int, default=0,
                        help="0 = full dataset")
    parser.add_argument("--batch-size", type=int, default=0,
                        help="PER-DEVICE batch size (0 = config default)")
    parser.add_argument("--image-size", type=int, default=0,
                        help="override input resolution (debug)")
    parser.add_argument("--train-h5", default="", help="COCO train hdf5 (reference format)")
    parser.add_argument("--val-h5", default="", help="COCO val hdf5")
    parser.add_argument("--synthetic-length", type=int, default=512,
                        help="records in the synthetic fallback dataset "
                             "(no --train-h5); larger = more scene "
                             "diversity — with --feed resident the store "
                             "scales to HBM (~0.8 MB/record at 512^2)")
    parser.add_argument("--swa", action="store_true", help="stochastic weight averaging")
    parser.add_argument("--swa-start-epoch", type=int, default=0)
    parser.add_argument("--swa-freq", type=int, default=0,
                        help="epochs per SWA cycle (0 = config default, 5)")
    parser.add_argument("--loss", choices=["focal", "l2"], default="focal")
    parser.add_argument("--lr", type=float, default=0.0,
                        help="override base learning rate (0 = config value)")
    parser.add_argument("--no-warmup", action="store_true",
                        help="disable the 3-epoch linear LR warmup")
    parser.add_argument("--workers", type=int, default=4,
                        help="host data-prefetch threads (0 = synchronous)")
    parser.add_argument("--stage-depth", type=int, default=2,
                        help="host->device staging lookahead: batches "
                             "device_put on a worker thread while the "
                             "previous step runs (0 = block in the step "
                             "loop; reference overlaps H2D with "
                             "non_blocking=True, train_distributed.py:256)")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="optimizer steps per device dispatch: K>1 "
                             "lax.scans K steps inside one XLA call "
                             "(train_lib.make_multi_train_step), dividing "
                             "the per-dispatch RPC overhead — the dominant "
                             "cost over the axon tunnel — by K")
    parser.add_argument("--feed",
                        choices=["dense", "compact", "compact-u8", "resident"],
                        default="dense",
                        help="host->device GT format: 'dense' ships the "
                             "(B,h,w,50) fp32 heatmaps; 'compact' ships bf16 "
                             "images + (joints, mask_all) and rasterizes the "
                             "gaussians inside the jitted step "
                             "(data/heatmaps_device.py) — ~4x less payload "
                             "per step, the dominant cost over a "
                             "network-attached chip; 'compact-u8' further "
                             "ships the images as uint8 (half the remaining "
                             "bytes; in-graph normalize, quantization ≤1/510 "
                             "≈ bf16 rounding); 'resident' uploads the whole "
                             "uint8 dataset to HBM once and per step ships "
                             "only (indices, affines, joints) — KILOBYTES; "
                             "gather + augmentation warp + GT rasterization "
                             "all run in-graph (data/resident.py)")
    parser.add_argument("--resident-shard-store", action="store_true",
                        help="with --feed resident: shard the store's record "
                             "ranges over the mesh's data axis instead of "
                             "replicating it (pod scale — datasets beyond "
                             "one chip's HBM; each batch element gathers "
                             "from the shard it lands on, collective-free)")
    parser.add_argument("--resident-augment", action="store_true",
                        help="with --feed resident: apply the geometric "
                             "augmentation on device even for the synthetic "
                             "dataset (h5 datasets augment by default, "
                             "mirroring the host pipeline; tint is skipped "
                             "— see data/resident.py)")
    parser.add_argument("--max-people", type=int, default=8,
                        help="people-slot padding for --feed compact")
    parser.add_argument("--max_grad_norm", type=float, default=0.0)
    parser.add_argument("--keep", type=int, default=3,
                        help="epoch checkpoints to retain (orbax "
                             "max_to_keep); raise to keep every epoch for "
                             "an AP-vs-epoch curve")
    parser.add_argument("--print-freq", type=int, default=20)
    parser.add_argument("--tiny-model", action="store_true",
                        help="small IMHN for smoke tests")
    parser.add_argument("--model", choices=["imhn", "ae"], default="imhn",
                        help="model family: IMHN (default) or AE stacked hourglass")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize hourglass activations "
                             "(~2x batch in HBM for ~6%% step time)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (multi-host pods)")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address for --multihost")
    args = parser.parse_args()

    if args.multihost:
        from improved_body_parts_tpu.parallel.mesh import initialize_multihost
        initialize_multihost(args.coordinator)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from improved_body_parts_tpu.configs import get_config
    from improved_body_parts_tpu import train_lib
    from improved_body_parts_tpu.configs import ModelConfig
    from improved_body_parts_tpu.models.imhn import create_model, init_model
    from improved_body_parts_tpu.parallel import mesh as mesh_lib
    from improved_body_parts_tpu.utils import checkpoint as ckpt_lib

    config = get_config(args.config)
    tcfg = dataclasses.replace(
        config.train,
        swa=args.swa,
        max_grad_norm=args.max_grad_norm,
        batch_size=args.batch_size or config.train.batch_size,
        learning_rate=args.lr or config.train.learning_rate,
        swa_freq_epochs=args.swa_freq or config.train.swa_freq_epochs,
    )
    config = dataclasses.replace(config, train=tcfg)
    image_size = args.image_size or config.height

    mesh = mesh_lib.make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    global_batch = tcfg.batch_size * n_dev
    print(f"devices: {n_dev}, per-device batch {tcfg.batch_size}, "
          f"global batch {global_batch}")

    mcfg = (ModelConfig(nstack=2, inp_dim=64, increase=32)
            if args.tiny_model else config.model)
    if args.remat:
        mcfg = dataclasses.replace(mcfg, remat=True)
    if args.model == "ae":
        from improved_body_parts_tpu.models.ae_pose import AEPoseNet
        model = AEPoseNet(cfg=mcfg, dtype=jnp.bfloat16)
    else:
        model = create_model(mcfg, dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     image_size, image_size)
    state = train_lib.create_train_state(params, batch_stats, tcfg)
    start_epoch = 0

    os.makedirs(args.checkpoint_path, exist_ok=True)
    ckpt_dir = os.path.join(args.checkpoint_path, "orbax")
    if args.resume and os.path.isdir(ckpt_dir):
        # restore against the live state as template so optax opt_state
        # keeps its NamedTuple structure (plain-dict restore breaks tx.update)
        template = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": 0, "epoch": 0,
            "train_loss": 0.0,
        }
        if args.swa:
            template["swa_params"] = state.swa_params
            template["swa_count"] = 0
        restored = ckpt_lib.restore_train_state(ckpt_dir, target=template)
        state = state._replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32))
        if args.swa and "swa_params" in restored:
            state = state._replace(
                swa_params=restored["swa_params"],
                swa_count=jnp.asarray(restored["swa_count"], jnp.int32))
        start_epoch = int(restored["epoch"]) + 1
        print(f"resumed from epoch {start_epoch - 1}")

    # data -------------------------------------------------------------
    if args.train_h5:
        from improved_body_parts_tpu.data.pipeline import CocoH5Dataset
        train_ds = CocoH5Dataset(args.train_h5, config, augment=True)
        val_ds = (CocoH5Dataset(args.val_h5, config, augment=False)
                  if args.val_h5 else None)
    else:
        from improved_body_parts_tpu.data.synthetic import SyntheticDataset
        print("no --train-h5 given: using the synthetic dataset")
        train_ds = SyntheticDataset(config, length=args.synthetic_length,
                                    image_size=image_size)
        val_ds = SyntheticDataset(config, length=64, seed=999,
                                  image_size=image_size)

    resident = args.feed == "resident"
    store = feed_r = None
    if resident:
        # the dataset lives in HBM: build the fixed-canvas store once,
        # replicate it over the mesh, and generate per-step plans on host
        from improved_body_parts_tpu.data import resident as resident_lib
        t0 = time.time()
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        store_shards = n_data if args.resident_shard_store else 1
        indices = None
        if store_shards > 1 and len(train_ds) % store_shards:
            # contiguous record ranges must divide evenly over the data axis
            keep = len(train_ds) - len(train_ds) % store_shards
            print(f"sharded store: trimming {len(train_ds) - keep} records "
                  f"to divide over {store_shards} data shards")
            indices = np.arange(keep)
        store_h = resident_lib.build_store(train_ds, indices=indices)
        store_sh = (mesh_lib.batch_sharding(mesh) if store_shards > 1
                    else mesh_lib.replicated(mesh))
        store = store_h.device_arrays(store_sh)
        feed_r = resident_lib.ResidentFeed(
            store_h, dataclasses.replace(config, width=image_size,
                                         height=image_size),
            augment=bool(args.train_h5) or args.resident_augment,
            max_people=args.max_people)
        mb = sum(int(np.prod(v.shape)) for v in store.values()) / 1e6
        print(f"resident store: {len(store_h)} records, {mb:.0f} MB uint8 "
              f"uploaded in {time.time() - t0:.1f}s")
    elif args.workers > 0:
        from improved_body_parts_tpu.data.prefetch import PrefetchingLoader
        train_ds = PrefetchingLoader(train_ds, num_workers=args.workers)

    steps = args.steps_per_epoch or max(len(train_ds) // global_batch, 1)
    kd = max(args.steps_per_dispatch, 1)
    compact = args.feed.startswith("compact")
    image_u8 = args.feed == "compact-u8"
    # the in-graph GT rasterizer (--feed compact) sizes its stride grid from
    # the config; keep it in lockstep with --image-size like the datasets do
    step_config = dataclasses.replace(config, width=image_size,
                                      height=image_size)
    if resident:
        make_res = (train_lib.make_multi_resident_train_step if kd > 1
                    else train_lib.make_resident_train_step)
        res_mesh = mesh if store_shards > 1 else None
        train_step = make_res(model, step_config,
                              use_focal=args.loss == "focal",
                              store_mesh=res_mesh)
        swa_step = (make_res(model, step_config,
                             use_focal=args.loss == "focal", freeze_bn=True,
                             store_mesh=res_mesh)
                    if args.swa else None)
    else:
        make_step = (train_lib.make_multi_train_step if kd > 1
                     else train_lib.make_train_step)
        train_step = make_step(model, step_config,
                               use_focal=args.loss == "focal",
                               compact_gt=compact)
        # SWA epochs run with frozen BatchNorm (train_distributed_SWA.py:221)
        swa_step = (make_step(model, step_config,
                              use_focal=args.loss == "focal",
                              freeze_bn=True, compact_gt=compact)
                    if args.swa else None)
    eval_step = train_lib.make_eval_step(model, config,
                                         use_focal=args.loss == "focal")

    log_path = os.path.join(args.checkpoint_path, "log")
    for epoch in range(start_epoch, args.epochs):
        t_epoch = time.time()
        # device-side metric accumulation: materializing per-step scalars
        # would force a host sync every step and kill async dispatch
        loss_accs, skip_accs = [], []
        swa_active = args.swa and epoch >= args.swa_start_epoch
        rank, world = jax.process_index(), jax.process_count()
        # device staging (assemble_global_batch) for batch N+1 overlaps
        # step N on a worker thread (reference: non_blocking H2D copies,
        # train_distributed.py:256-258)
        host_batches = None
        if not resident:
            host_batches = train_ds.batches(global_batch, steps, seed=epoch,
                                            rank=rank, world=world,
                                            compact=compact,
                                            image_u8=image_u8,
                                            max_people=args.max_people)

        def step_lr(step):
            if swa_active:
                # cyclic LR while averaging (train_distributed_SWA.py:365-371)
                return train_lib.cyclic_learning_rate(tcfg, epoch,
                                                      args.swa_start_epoch)
            return train_lib.learning_rate(tcfg, epoch, step, steps, n_dev,
                                           use_warmup=not args.no_warmup)

        active_step = swa_step if (swa_active and swa_step) else train_step
        if resident:
            # per-step payload: (idx, inv_m, joints) — a few KB; the store
            # is already in HBM and passes by handle
            plans = feed_r.plan_batches(global_batch, steps, seed=epoch,
                                        rank=rank, world=world,
                                        store_shards=store_shards)
            if kd > 1:
                # K scan steps per dispatch: with KB-sized plans this
                # divides the per-dispatch RPC overhead by K at ~zero
                # added transfer (unlike the wire feeds, where it hurt)
                step = 0
                for n_steps, chunk in mesh_lib.staged_chunks(
                        mesh, plans, k=kd, depth=max(args.stage_depth, 1)):
                    lrs = np.asarray([step_lr(step + i)
                                      for i in range(n_steps)], np.float32)
                    state, metrics = active_step(state, store, chunk[0],
                                                 chunk[1], chunk[2],
                                                 jnp.asarray(lrs))
                    loss_accs.append(metrics["loss"])
                    skip_accs.append(metrics["skipped"])
                    if (step // kd) % max(args.print_freq // kd, 1) == 0:
                        loss = float(metrics["loss"][-1])
                        print(f"epoch {epoch} step {step + n_steps - 1}"
                              f"/{steps} loss {loss:.4f} lr {lrs[-1]:.2e} "
                              f"gnorm {float(metrics['grad_norm'][-1]):.2f}")
                    step += n_steps
            else:
                if args.stage_depth > 0:
                    feed = mesh_lib.staged_batches(mesh, plans,
                                                   depth=args.stage_depth)
                else:
                    feed = (mesh_lib.assemble_global_batch(mesh, p)
                            for p in plans)
                for step, (idx, inv_m, joints) in enumerate(feed):
                    lr = step_lr(step)
                    state, metrics = active_step(state, store, idx, inv_m,
                                                 joints, jnp.float32(lr))
                    loss_accs.append(metrics["loss"])
                    skip_accs.append(metrics["skipped"])
                    if step % args.print_freq == 0:
                        loss = float(metrics["loss"])
                        print(f"epoch {epoch} step {step}/{steps} "
                              f"loss {loss:.4f} lr {lr:.2e} "
                              f"gnorm {float(metrics['grad_norm']):.2f}")
        elif kd > 1:
            # K optimizer steps per dispatch (lax.scan inside one XLA call);
            # staging of chunk N+1 overlaps dispatch N on a worker thread
            step = 0
            for n_steps, chunk in mesh_lib.staged_chunks(
                    mesh, host_batches, k=kd,
                    depth=max(args.stage_depth, 1)):
                lrs = np.asarray([step_lr(step + i) for i in range(n_steps)],
                                 np.float32)
                state, metrics = active_step(state, chunk[0], chunk[1],
                                             chunk[2], jnp.asarray(lrs))
                loss_accs.append(metrics["loss"])      # (n_steps,)
                skip_accs.append(metrics["skipped"])
                if (step // kd) % max(args.print_freq // kd, 1) == 0:
                    loss = float(metrics["loss"][-1])  # sync per print only
                    print(f"epoch {epoch} step {step + n_steps - 1}/{steps} "
                          f"loss {loss:.4f} lr {lrs[-1]:.2e} "
                          f"gnorm {float(metrics['grad_norm'][-1]):.2f}")
                step += n_steps
        else:
            if args.stage_depth > 0:
                feed = mesh_lib.staged_batches(mesh, host_batches,
                                               depth=args.stage_depth)
            else:
                feed = (mesh_lib.assemble_global_batch(mesh, b)
                        for b in host_batches)
            for step, batch in enumerate(feed):
                lr = step_lr(step)
                state, metrics = active_step(state, batch[0], batch[1],
                                             batch[2], jnp.float32(lr))
                loss_accs.append(metrics["loss"])
                skip_accs.append(metrics["skipped"])
                if step % args.print_freq == 0:
                    loss = float(metrics["loss"])  # sync only every print_freq
                    print(f"epoch {epoch} step {step}/{steps} loss {loss:.4f} "
                          f"lr {lr:.2e} gnorm {float(metrics['grad_norm']):.2f}")
        epoch_losses = np.asarray(jnp.concatenate(
            [jnp.atleast_1d(x) for x in loss_accs]))  # one fetch
        skipped = int(np.asarray(jnp.concatenate(
            [jnp.atleast_1d(x) for x in skip_accs])).sum())

        # SWA snapshot at the LOW point of each cyclic-LR cycle
        # (train_distributed_SWA.py: '% swa_freq == swa_freq - 1')
        if swa_active and \
                (epoch - args.swa_start_epoch) % tcfg.swa_freq_epochs == \
                tcfg.swa_freq_epochs - 1:
            state = train_lib.swa_update(state)
            print(f"SWA accumulate #{int(state.swa_count)}")

        # validation loss (reference test(), train_distributed.py:341-393)
        val_losses = []
        if val_ds is not None:
            for imgs, masks, heats in val_ds.batches(global_batch, max(steps // 8, 1),
                                                     seed=0, rank=rank, world=world):
                batch = mesh_lib.assemble_global_batch(mesh, (imgs, masks, heats))
                val_losses.append(float(eval_step(state.params, state.batch_stats,
                                                  batch[0], batch[1], batch[2])))
        train_loss = float(epoch_losses.mean()) if len(epoch_losses) else float("nan")
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
        dt = time.time() - t_epoch
        print(f"=== epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
              f"({dt:.1f}s, {skipped} skipped batches)")
        if rank == 0:  # rank-0-only logging (train_distributed.py:318-324)
            with open(log_path, "a") as f:
                f.write(f"Epoch {epoch}\ttrain_loss: {train_loss}\tval_loss: {val_loss}\n")

        ckpt_payload = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": int(state.step),
            "epoch": epoch, "train_loss": train_loss,
        }
        if args.swa and state.swa_params is not None:
            ckpt_payload["swa_params"] = state.swa_params
            ckpt_payload["swa_count"] = int(state.swa_count)
        ckpt_lib.save_train_state(ckpt_dir, ckpt_payload, step=epoch,
                                  keep=args.keep)

    if args.swa and int(state.swa_count) > 0:
        # publish the averaged model (reference swap_swa_sgd before the final
        # save, train_distributed_SWA.py:403-424)
        state = train_lib.swa_swap(state)
        swa_dir = os.path.join(args.checkpoint_path, "orbax_swa")
        ckpt_lib.save_train_state(swa_dir, {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": int(state.step),
            "epoch": args.epochs - 1, "swa_count": int(state.swa_count),
        }, step=args.epochs - 1)
        print(f"wrote SWA-averaged model ({int(state.swa_count)} snapshots) "
              f"to {swa_dir}")
    print("done")


if __name__ == "__main__":
    main()
