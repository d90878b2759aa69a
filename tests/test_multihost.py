"""Multi-process jax.distributed smoke test (SURVEY §4(d)).

Two CPU processes x 4 virtual devices each form one global 8-device dp mesh
via `initialize_distributed` (gloo collectives); each process feeds only its
local batch shards through `shard_batch_to_mesh` (multihost_utils global
assembly). The resulting loss and updated params must match a single-process
8-device run of the identical setup — proving the dp path is multi-host
correct end to end, not just over local devices.

Reference counterpart: none (the reference is single-GPU; SURVEY.md §2
callout designates distributed execution a new layer).
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_DIR = os.path.dirname(__file__)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process():
    steps = 2
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "proc0.npz")
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # worker sets its own device count
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        os.path.join(_DIR, "multihost_worker.py"),
                        "--process-id", str(pid),
                        "--num-processes", "2",
                        "--coordinator", f"localhost:{port}",
                        "--local-devices", "4",
                        "--steps", str(steps),
                        "--out", out,
                    ],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(stdout)
        for pid, (p, log) in enumerate(zip(procs, logs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{log}"
        multi = dict(np.load(out))

    # single-process reference on the conftest-pinned 8-device CPU mesh
    import jax
    import jax.numpy as jnp

    from multihost_common import make_setup
    from gemnet_pytorch_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch_to_mesh,
        stack_shards,
    )

    trainer, state, batches = make_setup(8)
    mesh = make_mesh(8)
    step_fn = make_dp_train_step(trainer, mesh)
    stacked = shard_batch_to_mesh(stack_shards(batches), mesh)
    for _ in range(steps):
        state, metrics, _ = step_fn(state, stacked, jnp.asarray(1.0, jnp.float32))

    ref_loss = float(jax.device_get(metrics["loss"]))
    np.testing.assert_allclose(float(multi["__loss__"]), ref_loss, rtol=1e-5)

    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    ref = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(
            jax.device_get(v)
        )
        for path, v in flat
    }
    assert set(ref) == set(k for k in multi if k != "__loss__")
    for k, v in ref.items():
        np.testing.assert_allclose(
            multi[k], v, rtol=2e-5, atol=1e-6, err_msg=f"param {k}"
        )


def test_two_process_halo_matches_single_process():
    """Rung 2b across processes: 2 procs x 2 local devices = one 4-shard ep
    mesh; the halo all_to_alls ride the cross-process collective backend.
    Loss and updated params must match a single-process 4-device halo run."""
    steps = 2
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "proc0.npz")
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        os.path.join(_DIR, "multihost_worker.py"),
                        "--process-id", str(pid),
                        "--num-processes", "2",
                        "--coordinator", f"localhost:{port}",
                        "--local-devices", "2",
                        "--steps", str(steps),
                        "--mode", "halo",
                        "--out", out,
                    ],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(stdout)
        for pid, (p, log) in enumerate(zip(procs, logs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{log}"
        multi = dict(np.load(out))

    import jax
    import jax.numpy as jnp

    from multihost_common import make_halo_setup
    from gemnet_pytorch_tpu.parallel import (
        make_halo_train_step,
        make_mesh,
        shard_halo_batch,
    )

    trainer, state, part = make_halo_setup(4)
    mesh = make_mesh(4, axis_names=("ep",))
    step_fn = make_halo_train_step(trainer, mesh)
    batch = shard_halo_batch(part, mesh)
    for _ in range(steps):
        state, metrics = step_fn(state, batch, jnp.asarray(1.0, jnp.float32))

    ref_loss = float(jax.device_get(metrics["loss"]))
    np.testing.assert_allclose(float(multi["__loss__"]), ref_loss, rtol=1e-5)

    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    ref = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(
            jax.device_get(v)
        )
        for path, v in flat
    }
    assert set(ref) == set(k for k in multi if k != "__loss__")
    for k, v in ref.items():
        np.testing.assert_allclose(
            multi[k], v, rtol=2e-5, atol=1e-6, err_msg=f"param {k}"
        )
