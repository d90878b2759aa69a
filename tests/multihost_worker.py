"""Worker for tests/test_multihost.py: one of N processes in a
jax.distributed CPU run (SURVEY §4(d) smoke plan).

Builds the same deterministic tiny setup as the single-process reference in
the test, takes `--steps` dp train steps over the GLOBAL mesh feeding only
this process's local batch shards, and dumps the post-step loss and params
to --out (process 0 only).

Usage (spawned by the test):
    python multihost_worker.py --process-id I --num-processes N \
        --coordinator localhost:PORT --local-devices 4 --steps 2 --out f.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--mode", default="dp", choices=["dp", "halo"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gemnet_pytorch_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices

    import numpy as np

    import jax.numpy as jnp

    if args.mode == "halo":
        # rung 2b across processes: halo all_to_alls ride the cross-process
        # collective backend
        from multihost_common import make_halo_setup

        from gemnet_pytorch_tpu.parallel import (
            make_halo_train_step,
            make_mesh,
            shard_halo_batch,
        )

        trainer, state, part = make_halo_setup(n_global)
        mesh = make_mesh(n_global, axis_names=("ep",))
        step_fn = make_halo_train_step(trainer, mesh)
        batch = shard_halo_batch(part, mesh)
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch, jnp.asarray(1.0, jnp.float32))
    else:
        from multihost_common import make_setup

        from gemnet_pytorch_tpu.parallel import (
            make_dp_train_step,
            make_mesh,
            shard_batch_to_mesh,
            stack_shards,
        )

        trainer, state, batches = make_setup(n_global)
        mesh = make_mesh(n_global)
        step_fn = make_dp_train_step(trainer, mesh)
        lo = args.process_id * args.local_devices
        local = stack_shards(batches[lo : lo + args.local_devices])
        stacked = shard_batch_to_mesh(local, mesh)
        for _ in range(args.steps):
            state, metrics, _ = step_fn(state, stacked, jnp.asarray(1.0, jnp.float32))
    loss = float(jax.device_get(metrics["loss"]))

    if args.process_id == 0:
        flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
        out = {
            "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(
                jax.device_get(v)
            )
            for path, v in flat
        }
        out["__loss__"] = np.asarray(loss)
        np.savez(args.out, **out)
    print(f"[proc {args.process_id}] done, loss={loss}", flush=True)


if __name__ == "__main__":
    main()
