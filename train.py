#!/usr/bin/env python
"""Training driver — counterpart of the reference's train_seml.py:42-387.

Reads the same flat YAML config schema (config.yaml), builds the model/data/
trainer, and runs the step loop with periodic checkpointing, EMA-swapped
validation, best-model tracking, plateau LR decay, and early stopping.

Usage:
    python train.py [--config config.yaml] [--num-steps N] [--dataset PATH]

If the configured dataset is missing, a synthetic COLL-like dataset is
generated (the reference's COLL npz blobs are large-blob-stripped).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import string
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config.yaml")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--dataset", default=None)
    p.add_argument("--val-dataset", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--evaluation-interval", type=int, default=None)
    p.add_argument("--save-interval", type=int, default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--restart", default=None)
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    p.add_argument("--export-torch", default=None,
                   help="after training, export the EMA weights as a "
                   "reference-loadable PyTorch .pth state dict "
                   "(compat.torch_export)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over N devices (0 = single device; "
                   "multihost: GLOBAL device count, defaults to all)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="train steps fused into one device dispatch via "
                   "lax.scan (single-device path; numerically identical to "
                   "single steps — tests/test_flat_opt.py). Amortizes "
                   "per-dispatch overhead, but the ~Kx-bigger program is "
                   "exposed to the pooled runtime's per-call program "
                   "re-upload mode (CLAUDE.md); benchmark before raising.")
    p.add_argument("--ep", type=int, default=0,
                   help="edge-partitioned (rung 2a) over N local devices: "
                   "triplet/quad row spaces sharded, host partitioning runs "
                   "in the data prefetch threads (parallel/ep.py). "
                   "DEPRECATED: rung 2a replicates edge embeddings and pays "
                   "~8.3x the AD communication of --halo (213 vs 25.6 "
                   "MB/shard, artifacts_r02_comm.md) — prefer --halo N")
    p.add_argument("--halo", type=int, default=0,
                   help="fully edge-partitioned (rung 2b) over N local "
                   "devices: edge/intm/row spaces sharded with halo "
                   "all_to_all per block; partitioning runs in the prefetch "
                   "threads (parallel/halo.py)")
    p.add_argument("--dp-halo", type=int, nargs=2, default=None,
                   metavar=("DP", "EP"),
                   help="composed 2-D mesh (production layout): DP molecule "
                   "batches, each fully edge-partitioned over EP with halo "
                   "all_to_alls (parallel/hybrid.py make_dp_halo_train_step)")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline parallelism over N local devices: the "
                   "interaction-block stack staged over a pp mesh (GPipe "
                   "schedule, parallel/pp.py PPTrainer); stage params + Adam "
                   "moments + EMA shard 1/N per chip")
    p.add_argument("--pp-micro", type=int, default=0,
                   help="microbatches per pp train step (default 4*pp; the "
                   "GPipe bubble is (S-1)/(M+S-1)); effective batch = "
                   "pp_micro * batch_size")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor parallelism over N local devices: GSPMD "
                   "width-sharded params with the tree-path optimizer "
                   "(parallel/tp.py); params/moments/EMA shard 1/N per chip")
    # multi-host (jax.distributed over DCN): every process runs this same
    # driver with its own --process-id; the dp mesh spans all processes and
    # each process feeds only its local shards (parallel/dp.py assembles the
    # global batch). Writers/checkpoints are process-0 only. Smoke-tested in
    # tests/test_multihost.py. Reference: none (single-GPU, train_seml.py).
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (enables multi-host mode)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--synthetic-molecules", type=int, default=512)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    multihost = args.coordinator is not None
    if multihost:
        from gemnet_pytorch_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if not args.dp:
            args.dp = len(jax.devices())
        assert args.dp == len(jax.devices()), (
            f"multihost --dp must equal the global device count "
            f"({args.dp} != {len(jax.devices())})")
    is_main = jax.process_index() == 0

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(levelname)s): %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider, make_dataset
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.models.scaling import load_scales_from_json
    from gemnet_pytorch_tpu.training import (
        BestMetrics,
        Metrics,
        PlateauState,
        Trainer,
        restore_checkpoint,
        save_checkpoint,
        save_params,
    )

    config = load_yaml_config(args.config) if os.path.exists(args.config) else {}
    if os.environ.get("GEMNET_SWEEP_OVERRIDES"):
        import json as _json

        config.update(_json.loads(os.environ["GEMNET_SWEEP_OVERRIDES"]))
    if args.tp:
        # tp inherits per-tensor shardings; the flat vector cannot carry them
        config["flat_optimizer"] = False
    for key in ("num_steps", "dataset", "val_dataset", "batch_size", "logdir",
                "restart", "evaluation_interval", "save_interval"):
        val = getattr(args, key.replace("-", "_"), None)
        if val is not None:
            config[key] = val
    mcfg = ModelConfig.from_dict(config)
    tcfg = TrainConfig.from_dict(config)

    np.random.seed(tcfg.data_seed)
    rng_key = jax.random.PRNGKey(tcfg.tfseed)

    # ---- run directory (reference train_seml.py:116-137) ----
    if tcfg.restart in (None, "None"):
        if multihost:
            # every process must resolve the SAME directory: deterministic
            # name (no per-process timestamp/uid)
            uid, stamp = "multihost", f"np{jax.process_count()}"
        else:
            uid = "".join(
                random.SystemRandom().choice(string.ascii_letters + string.digits)
                for _ in range(6)
            )
            stamp = datetime.now().strftime('%Y%m%d_%H%M%S')
        directory = os.path.join(
            tcfg.logdir,
            f"{stamp}_{uid}_"
            f"{os.path.basename(tcfg.dataset or 'synthetic')}_{tcfg.comment}",
        )
    else:
        directory = tcfg.restart
    best_dir = os.path.join(directory, "best")
    log_dir = os.path.join(directory, "logs")
    for d in (directory, best_dir, log_dir):
        os.makedirs(d, exist_ok=True)
    logging.info("Directory: %s", directory)

    ckpt_path = os.path.join(log_dir, "checkpoint")
    best_path = os.path.join(best_dir, "model")

    # ---- data ----
    dataset = tcfg.dataset
    if not dataset or not os.path.exists(dataset):
        # per-process filename: the seeded content is identical, but
        # concurrent multihost writes to one path would race
        suffix = f"_p{jax.process_index()}" if multihost else ""
        dataset = os.path.join(directory, f"synthetic_train{suffix}.npz")
        logging.warning("dataset missing; generating synthetic data at %s", dataset)
        make_dataset(dataset, n_molecules=args.synthetic_molecules, seed=tcfg.data_seed)
    container = DataContainer(
        dataset, cutoff=mcfg.cutoff, int_cutoff=mcfg.int_cutoff,
        triplets_only=mcfg.triplets_only,
    )
    num_train = tcfg.num_train or int(0.9 * len(container))
    num_val = tcfg.num_val or len(container) - num_train
    provider = DataProvider(
        container, num_train, num_val, tcfg.batch_size,
        seed=tcfg.data_seed, shuffle=True, random_split=True,
    )
    train_iter = None  # created after the trainer exists (packed batches)
    val_iter = None
    logging.info("pad dims: %s", provider.pad_dims)

    # ---- model/trainer ----
    model = make_model(mcfg)
    sample_iter = provider.get_dataset("train", prefetch_workers=0)
    sample = {k: jnp.asarray(v) for k, v in next(sample_iter).items()}
    variables = dict(jax.jit(model.init)(rng_key, sample))
    if mcfg.scale_file and os.path.exists(mcfg.scale_file):
        variables["scale_factors"] = load_scales_from_json(
            variables.get("scale_factors", {}), mcfg.scale_file
        )
        logging.info("loaded scale factors from %s", mcfg.scale_file)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logging.info("nParams: %d", n_params)

    trainer = Trainer(model, tcfg)
    assert sum(bool(x) for x in
               (args.dp, args.ep, args.halo, args.dp_halo is not None,
                args.pp, args.tp)) <= 1, (
        "pick one of --dp / --ep / --halo / --dp-halo / --pp / --tp")
    pp_trainer = None
    if args.pp:
        from gemnet_pytorch_tpu.parallel import make_mesh
        from gemnet_pytorch_tpu.parallel.pp import PPTrainer

        pp_micro = args.pp_micro or 4 * args.pp
        pp_mesh = make_mesh(args.pp, axis_names=("pp",))
        pp_trainer = PPTrainer(trainer, pp_mesh, pp_micro)
        state = pp_trainer.init_state(variables)
        logging.info("pipeline over %d stages, %d microbatches: %s",
                     args.pp, pp_micro, pp_mesh)
    elif args.tp:
        from gemnet_pytorch_tpu.parallel import make_mesh
        from gemnet_pytorch_tpu.parallel.tp import init_tp_state

        tp_mesh = make_mesh(args.tp, axis_names=("tp",))
        state = init_tp_state(trainer, variables, tp_mesh)
        logging.info("tensor parallel over %d devices: %s", args.tp, tp_mesh)
    else:
        state = trainer.init_state(variables)
    # batches packed into single buffers inside the prefetch threads
    if args.ep:
        logging.warning(
            "--ep (rung 2a) is deprecated: it replicates edge embeddings and "
            "pays ~8.3x the AD communication of --halo (213 vs 25.6 MB/shard "
            "at S=8, artifacts_r02_comm.md); use --halo %d instead", args.ep)
        # row partitioning runs in the prefetch threads too (transform), off
        # the step critical path; fixed chunk sizes keep compiles stable
        from gemnet_pytorch_tpu.data.padding import ROW_BLOCK, round_up
        from gemnet_pytorch_tpu.parallel import make_mesh, partition_batch

        dims = provider.pad_dims
        trip_chunk = round_up(-(-dims.n_triplets // args.ep), ROW_BLOCK)
        quad_chunk = (round_up(-(-dims.n_quads // args.ep), ROW_BLOCK)
                      if not mcfg.triplets_only else None)

        def ep_transform(b):
            return partition_batch(
                b, args.ep, trip_chunk=trip_chunk, quad_chunk=quad_chunk
            )

        train_iter = provider.get_dataset("train", transform=ep_transform)
        ep_mesh = make_mesh(args.ep, axis_names=("ep",))
        logging.info("edge-partitioned over %d devices: %s", args.ep, ep_mesh)
    elif args.halo or args.dp_halo:
        # rung 2b: the halo partitioner replaces padding entirely
        # (raw_transform) and runs in the prefetch threads; HaloPads are
        # estimated from sample batches and grown (rare recompile) on
        # outlier batches, mirroring provider.pad_dims. --dp-halo partitions
        # each dp shard's batch the same way over EP devices.
        import threading

        from gemnet_pytorch_tpu.parallel import (
            build_halo_partition, estimate_halo_pads, make_mesh,
        )

        n_ep_shards = args.halo or args.dp_halo[1]
        rng_p = np.random.RandomState(0)
        train_idx = provider.idx["train"]

        def sample_raw(n=8):
            for _ in range(n):
                sel = rng_p.choice(
                    train_idx, size=min(tcfg.batch_size, len(train_idx)),
                    replace=False)
                yield container.build(sel)

        halo_pads = estimate_halo_pads(
            sample_raw(), n_ep_shards, triplets_only=mcfg.triplets_only,
            headroom=1.25, n_mol=tcfg.batch_size)
        pads_lock = threading.Lock()
        logging.info("halo pads: %s", halo_pads)

        def halo_transform(g, Z, R, E, F):
            nonlocal halo_pads
            part = build_halo_partition(
                g, Z, R, n_ep_shards, E=E, F=F,
                triplets_only=mcfg.triplets_only, pads=halo_pads)
            used = part["halo_pads"]
            if not halo_pads.covers(used):  # outlier: grow + rebuild once
                with pads_lock:
                    halo_pads = halo_pads.grow_to(used, headroom=1.25)
                logging.info("halo pads grown: %s", halo_pads)
                part = build_halo_partition(
                    g, Z, R, n_ep_shards, E=E, F=F,
                    triplets_only=mcfg.triplets_only, pads=halo_pads)
            return part

        train_iter = provider.get_dataset("train", raw_transform=halo_transform)
        if args.halo:
            ep_mesh = make_mesh(args.halo, axis_names=("ep",))
            logging.info(
                "halo-partitioned over %d devices: %s", args.halo, ep_mesh)
        else:
            from gemnet_pytorch_tpu.parallel import make_hybrid_mesh

            hybrid_mesh = make_hybrid_mesh(*args.dp_halo)
            logging.info(
                "dp%d x halo%d over %s", *args.dp_halo, hybrid_mesh)
    elif args.pp:
        # pp consumes M dict microbatches per step (stacked in PPTrainer)
        train_iter = provider.get_dataset("train")
    else:
        train_iter = provider.get_dataset("train", transform=trainer.packer.pack)
    # validation runs on the SAME mesh as training under --dp/--halo/--dp-halo
    # (no chip idles during eval); EMA weights are replicated either way
    if args.halo or args.dp_halo:
        # partitions built inline at eval time: prefetched parts could go
        # stale if a train-side outlier grows halo_pads mid-interval
        val_iter = provider.get_dataset(
            "val", raw_transform=halo_transform, prefetch_workers=0)
    else:
        val_iter = provider.get_dataset("val", transform=trainer.packer.pack)
    dp_step = None
    ep_step = None
    halo_step = None
    dp_halo_step = None
    dp_eval = None
    halo_eval = None
    dp_halo_eval = None
    if args.dp:
        from gemnet_pytorch_tpu.parallel import (
            make_dp_train_step, make_mesh, shard_batch_to_mesh, stack_shards,
        )

        mesh = make_mesh(args.dp)
        logging.info("data parallel over %d devices: %s", args.dp, mesh)
    plateau = PlateauState(
        factor=tcfg.decay_factor, patience=tcfg.decay_patience,
        cooldown=tcfg.decay_cooldown,
    )

    from gemnet_pytorch_tpu.training.metrics import make_writer

    # non-main processes log to a sidecar dir (same metrics are computed
    # everywhere — plateau/early-stop must stay in lockstep — but only
    # process 0's stream is the record)
    writer = make_writer(log_dir if is_main
                         else os.path.join(directory, f"logs_p{jax.process_index()}"))
    train_metrics = Metrics("train", trainer.tracked_metrics)
    val_metrics = Metrics("val", trainer.tracked_metrics)
    # non-main: sidecar best file (in-memory state stays in lockstep for
    # plateau/early-stop; only process 0's npz is the record)
    best_state_dir = best_dir if is_main else os.path.join(
        directory, f"best_p{jax.process_index()}")
    os.makedirs(best_state_dir, exist_ok=True)
    best_metrics = BestMetrics(best_state_dir, val_metrics, assert_exist=False)

    step_init = 0
    if os.path.exists(ckpt_path):
        state, plateau = restore_checkpoint(ckpt_path, state, plateau)
        best_metrics.restore()
        step_init = int(state.step)
        logging.info("restored checkpoint at step %d", step_init)
    else:
        best_metrics.initialize()

    # ---- loop (reference train_seml.py:308-387) ----
    steps_per_epoch = int(np.ceil(num_train / tcfg.batch_size))
    t_start, t_steps = None, 0
    step = step_init
    # torch scheduler mechanics (reference ReduceLROnPlateau mutates base_lrs
    # AFTER the current step's scheduler.step() already computed the next
    # step's lr, trainer.py:658-668): a plateau reduce at the eval following
    # step s takes effect at step s+2, not s+1. lr_eff is snapshotted before
    # each eval to reproduce that exactly (tests/test_trajectory_parity.py).
    lr_eff = plateau.lr_scale
    while step < tcfg.num_steps:
        # single-device path: K steps per device dispatch (lax.scan over
        # stacked packed batches, trainer.multi_step_fn) — the per-dispatch
        # fixed cost dominates the latency-bound step. Chunks are clamped so
        # they never cross a logging/checkpoint/eval boundary, keeping event
        # timing (and plateau lr_scale constancy within a chunk) exact.
        k = 1
        if args.steps_per_call > 1 and not (
                args.dp or args.ep or args.halo or args.dp_halo or args.pp):
            k = min(args.steps_per_call, tcfg.num_steps - step)
            for interval in (10, tcfg.save_interval, tcfg.evaluation_interval):
                k = min(k, interval - step % interval)
            if lr_eff != plateau.lr_scale:
                k = 1  # the delayed pre-reduce scale applies to ONE step
        step += k
        # async step: metrics accumulate on device, drained at eval intervals
        if args.dp:
            if dp_step is None:
                dp_step = make_dp_train_step(trainer, mesh)
            # multihost: every process draws the SAME args.dp global batches
            # (seeded identically) and ships only its local slice; the global
            # array is assembled in shard_batch_to_mesh
            shards = [next(train_iter) for _ in range(args.dp)]
            if multihost:
                n_local = len(jax.local_devices())
                lo = jax.process_index() * n_local
                shards = shards[lo:lo + n_local]
            stacked = shard_batch_to_mesh(stack_shards(shards), mesh)
            state, _, _ = dp_step(state, stacked, jnp.asarray(lr_eff))
        elif args.ep:
            if ep_step is None:
                from gemnet_pytorch_tpu.parallel import shard_ep_batch
                from gemnet_pytorch_tpu.parallel.ep import make_ep_train_step

                ep_step = make_ep_train_step(trainer, ep_mesh)
            batch = shard_ep_batch(next(train_iter), ep_mesh)
            state, _ = ep_step(state, batch, jnp.asarray(lr_eff))
        elif args.halo:
            if halo_step is None:
                from gemnet_pytorch_tpu.parallel import (
                    make_halo_train_step, shard_halo_batch,
                )

                halo_step = make_halo_train_step(trainer, ep_mesh)
            batch = shard_halo_batch(next(train_iter), ep_mesh)
            state, _ = halo_step(state, batch, jnp.asarray(lr_eff))
        elif args.dp_halo:
            if dp_halo_step is None:
                from gemnet_pytorch_tpu.parallel import (
                    make_dp_halo_train_step, shard_dp_halo_batch,
                )
                from gemnet_pytorch_tpu.parallel.halo import device_batch_halo

                dp_halo_step = make_dp_halo_train_step(trainer, hybrid_mesh)
            # one halo-partitioned batch per dp group; a rare pads-growth
            # event invalidates queued partitions built with the old shape —
            # drop those and refetch (monotone growth converges)
            parts = []
            while len(parts) < args.dp_halo[0]:
                part = next(train_iter)
                parts = [q for q in parts if q["halo_pads"] == halo_pads]
                if part["halo_pads"] == halo_pads:
                    parts.append(part)
            stacked = {
                k: np.stack([device_batch_halo(q)[k] for q in parts])
                for k in device_batch_halo(parts[0])
            }
            batch = shard_dp_halo_batch(stacked, hybrid_mesh)
            state, _ = dp_halo_step(state, batch, jnp.asarray(lr_eff))
        elif args.pp:
            state, _ = pp_trainer.train_on_microbatches(
                state, [next(train_iter) for _ in range(pp_micro)],
                lr_eff)
        elif k > 1:
            state, _ = trainer.train_on_batches(
                state, [next(train_iter) for _ in range(k)], lr_eff)
        else:
            state, _ = trainer.train_on_batch(state, next(train_iter), lr_eff)
        # snapshot BEFORE any plateau.step below: a reduce decided at this
        # step's eval must first apply two steps out (see lr_eff note above)
        lr_eff = plateau.lr_scale
        if t_start is None and step >= step_init + 2:
            t_start, t_steps = time.perf_counter(), step  # skip compile steps

        if step % 10 == 0:
            writer.add_scalar("lr_scale", plateau.lr_scale, step)

        if step % tcfg.save_interval == 0 and is_main:
            save_checkpoint(ckpt_path, state, plateau)

        if step % tcfg.evaluation_interval == 0:
            if t_start is not None and step > t_steps:
                sps = (time.perf_counter() - t_start) / (step - t_steps)
                writer.add_scalar("seconds_per_step", sps, step)
                logging.info(
                    "seconds_per_step=%.4f min_per_epoch=%.2f",
                    sps, sps * steps_per_epoch / 60,
                )
            # restart the window so eval/checkpoint time does not pollute
            # the next measurement (reference train_seml.py:313-325 measures
            # a single early window for the same reason)
            t_start, t_steps = None, step
            state = trainer.drain_metrics(state, train_metrics)
            # EMA-swapped validation (reference train_seml.py:345-356)
            n_val_batches = int(np.ceil(num_val / tcfg.batch_size))
            pp_merged = None
            if args.pp:
                # merge the pipeline's pre/stage split back to a monolithic
                # EMA tree once per interval; eval runs the standard step
                pp_merged = pp_trainer.merged_variables(state, ema=True)
                eval_step = trainer.eval_step_fn()
                for _ in range(n_val_batches):
                    m, c = eval_step(
                        pp_merged["params"], pp_merged.get("scale_factors", {}),
                        jnp.asarray(next(val_iter)))
                    trainer._update_metrics(val_metrics, m, c)
            elif args.dp:
                # mesh-parallel EMA eval: args.dp val batches per dispatch;
                # the remainder group is padded with zero-masked rows, which
                # contribute 0 to every num/den pair (no double counting)
                if dp_eval is None:
                    from gemnet_pytorch_tpu.parallel import make_dp_eval_step

                    dp_eval = make_dp_eval_step(trainer, mesh)
                done = 0
                while done < n_val_batches:
                    take = min(args.dp, n_val_batches - done)
                    rows = [next(val_iter) for _ in range(take)]
                    done += take
                    rows += [trainer.packer.zero_masks(rows[0])] * (args.dp - take)
                    if multihost:
                        n_local = len(jax.local_devices())
                        lo = jax.process_index() * n_local
                        rows = rows[lo:lo + n_local]
                    stacked = shard_batch_to_mesh(stack_shards(rows), mesh)
                    m, c = dp_eval(state.ema_params, state.scales, stacked)
                    trainer._update_metrics(val_metrics, m, c)
            elif args.halo:
                if halo_eval is None:
                    from gemnet_pytorch_tpu.parallel import make_halo_eval_step

                    halo_eval = make_halo_eval_step(trainer, ep_mesh)
                from gemnet_pytorch_tpu.parallel import shard_halo_batch as _shb
                for _ in range(n_val_batches):
                    b = _shb(next(val_iter), ep_mesh)
                    m, c = halo_eval(state.ema_params, state.scales, b)
                    trainer._update_metrics(val_metrics, m, c)
            elif args.dp_halo:
                if dp_halo_eval is None:
                    from gemnet_pytorch_tpu.parallel import (
                        make_dp_halo_eval_step,
                    )

                    dp_halo_eval = make_dp_halo_eval_step(trainer, hybrid_mesh)
                from gemnet_pytorch_tpu.parallel import (
                    shard_dp_halo_batch as _sdhb,
                )
                from gemnet_pytorch_tpu.parallel.halo import device_batch_halo

                def _zero_masks_part(q):
                    q = dict(q)
                    for mk in ("mol_mask", "atom_mask"):
                        q[mk] = np.zeros_like(q[mk])
                    return q

                done = 0
                n_dp = args.dp_halo[0]
                while done < n_val_batches:
                    take = min(n_dp, n_val_batches - done)
                    parts = []
                    while len(parts) < take:
                        part = next(val_iter)
                        if part["halo_pads"] == halo_pads:
                            parts.append(part)
                    done += take
                    parts += [_zero_masks_part(parts[0])] * (n_dp - take)
                    stacked = {
                        k: np.stack([device_batch_halo(q)[k] for q in parts])
                        for k in device_batch_halo(parts[0])
                    }
                    b = _sdhb(stacked, hybrid_mesh)
                    m, c = dp_halo_eval(state.ema_params, state.scales, b)
                    trainer._update_metrics(val_metrics, m, c)
            else:
                for _ in range(n_val_batches):
                    trainer.test_on_batch(
                        state, next(val_iter), val_metrics, use_ema=True)
            if val_metrics.loss < best_metrics.loss:
                best_metrics.update(step, val_metrics)
                if is_main:
                    # model-only checkpoint keeps the structured layout so
                    # predict/examples restore into a params tree
                    if args.pp:
                        save_params(best_path, pp_merged["params"],
                                    pp_merged.get("scale_factors"))
                    else:
                        save_params(best_path, trainer.ema_tree(state), state.scales)
            best_metrics.write(writer, step)
            logging.info(
                "%d/%d (epoch %d): %s",
                step, tcfg.num_steps, step // steps_per_epoch,
                "; ".join(
                    f"{k}: train={train_metrics.result(False)[k]:.6f}, "
                    f"val={val_metrics.result(False)[k]:.6f}"
                    for k in val_metrics.keys
                ),
            )
            plateau.step(val_metrics.loss)
            train_metrics.write(writer, step)
            val_metrics.write(writer, step)
            train_metrics.reset_states()
            val_metrics.reset_states()
            if step - best_metrics.step > tcfg.patience * tcfg.evaluation_interval:
                logging.info("early stopping at step %d", step)
                break

    if is_main:
        save_checkpoint(ckpt_path, state, plateau)
        if args.export_torch:
            from gemnet_pytorch_tpu.compat import save_reference_checkpoint

            if args.pp:
                ex = pp_trainer.merged_variables(state, ema=True)
            else:
                ex = {"params": trainer.ema_tree(state),
                      "scale_factors": state.scales}
            save_reference_checkpoint(args.export_torch, ex, mcfg)
            logging.info("exported reference .pth to %s", args.export_torch)
    logging.info("done; best: %s", dict(best_metrics.items()))
    return {f"{k}_best": v for k, v in best_metrics.items()}


if __name__ == "__main__":
    main()
