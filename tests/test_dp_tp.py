"""dp x tp composition (parallel/tp.py make_dp_tp_train_step): the 'composes
with dp for free (pure GSPMD)' claim, asserted with the same rigor as
tests/test_hybrid.py::test_dp_halo_train_step_matches_single_device —
one optimizer step on a 2-D (dp, tp) mesh must reproduce the SAME step
executed unpartitioned on one device, and the state must actually shard."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from __graft_entry__ import _make_graphs, _pad, _shared_dims, _small_cfg
from gemnet_pytorch_tpu.config import TrainConfig
from gemnet_pytorch_tpu.models import make_model
from gemnet_pytorch_tpu.parallel.tp import (
    check_tp_opt_sharding,
    init_tp_state,
    make_dp_tp_train_step,
    shard_dp_batch,
    stack_dp_batches,
)
from gemnet_pytorch_tpu.training import Trainer


def _dp_tp_mesh(n_dp, n_tp):
    devs = np.array(jax.devices()[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, axis_names=("dp", "tp"))


def _setup(n_dp=2):
    cfg = _small_cfg(triplets_only=False, direct_forces=False)
    tcfg = TrainConfig(weight_decay=2e-6, flat_optimizer=False, rho_force=0.9)
    model = make_model(cfg)
    tups = [_make_graphs(cfg, n_molecules=2, seed=s, max_atoms=7)
            for s in range(n_dp)]
    dims = _shared_dims(cfg, tups)
    shards = [_pad(cfg, t, dims) for t in tups]
    stacked = stack_dp_batches(shards)
    sample = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), sample))
    trainer = Trainer(model, tcfg)
    return cfg, model, trainer, variables, stacked


def test_dp_tp_train_step_matches_single_device():
    cfg, model, trainer, variables, stacked = _setup(n_dp=2)
    mesh = _dp_tp_mesh(2, 4)

    # baseline: the SAME step function, unpartitioned (single default device)
    base_state = trainer.init_state(
        jax.tree_util.tree_map(jnp.asarray, variables)
    )
    step = make_dp_tp_train_step(trainer, mesh)
    jbatch = {k: jnp.asarray(v) for k, v in stacked.items()}
    base_state, base_metrics, base_counts = step(
        base_state, jbatch, jnp.asarray(1.0)
    )

    # partitioned: tp-sharded state, dp-sharded batch, identical math
    tp_trainer = Trainer(model, trainer.cfg)
    state = init_tp_state(tp_trainer, dict(variables), mesh)
    pstep = make_dp_tp_train_step(tp_trainer, mesh)
    pbatch = shard_dp_batch(stacked, mesh)
    state, metrics, counts = pstep(state, pbatch, jnp.asarray(1.0))

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(base_metrics["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(counts["n_mol"]), float(base_counts["n_mol"])
    )
    # parameters after one step agree leaf-by-leaf
    flat_p, _ = jax.flatten_util.ravel_pytree(jax.device_get(state.params))
    flat_b, _ = jax.flatten_util.ravel_pytree(jax.device_get(base_state.params))
    np.testing.assert_allclose(
        np.asarray(flat_p), np.asarray(flat_b), rtol=3e-4, atol=3e-6
    )

    # the memory win is real: params + Adam moments sharded over tp,
    # replicated (NOT sharded) over dp
    kernel = state.params["atom_emb"]["embeddings"]
    assert not kernel.sharding.is_fully_replicated
    spec = kernel.sharding.spec
    assert "tp" in [s for s in spec if s is not None]
    assert "dp" not in [s for s in spec if s is not None]
    check_tp_opt_sharding(state.opt_state, state.params, mesh)

    # the batch genuinely shards over dp
    assert pbatch["R"].sharding.spec[0] == "dp"


def test_dp_tp_second_step_stays_sharded():
    """After repeated steps the state keeps its tp shardings (no silent
    resharding drift in the jitted update)."""
    cfg, model, trainer, variables, stacked = _setup(n_dp=2)
    mesh = _dp_tp_mesh(2, 2)
    tp_trainer = Trainer(model, trainer.cfg)
    state = init_tp_state(tp_trainer, dict(variables), mesh)
    step = make_dp_tp_train_step(tp_trainer, mesh)
    batch = shard_dp_batch(stacked, mesh)
    for _ in range(2):
        state, metrics, _ = step(state, batch, jnp.asarray(1.0))
    assert np.isfinite(float(metrics["loss"]))
    kernel = state.params["atom_emb"]["embeddings"]
    assert not kernel.sharding.is_fully_replicated
    check_tp_opt_sharding(state.opt_state, state.params, mesh)
