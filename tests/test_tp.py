"""Tensor parallelism (parallel/tp.py): GSPMD-sharded params must reproduce
the single-device model exactly (it's the same program, partitioned)."""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_graphs, _pad, _shared_dims, _small_cfg
from gemnet_pytorch_tpu.models import energy_and_forces, make_model
from gemnet_pytorch_tpu.parallel.mesh import make_mesh
from gemnet_pytorch_tpu.parallel.tp import (
    make_tp_energy_and_forces,
    make_tp_loss_and_grad,
    shard_tp_variables,
    tp_param_specs,
)


def _setup(direct_forces):
    cfg = _small_cfg(triplets_only=False, direct_forces=direct_forces)
    model = make_model(cfg)
    tup = _make_graphs(cfg, n_molecules=2, seed=3, max_atoms=7)
    batch_np = _pad(cfg, tup, _shared_dims(cfg, [tup]))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return cfg, model, variables, batch


def test_tp_sharded_params_are_actually_sharded():
    cfg, model, variables, batch = _setup(direct_forces=True)
    mesh = make_mesh(2, axis_names=("tp",))
    sharded = shard_tp_variables(variables, mesh)
    kernel = sharded["params"]["atom_emb"]["embeddings"]
    assert not kernel.sharding.is_fully_replicated
    n_sharded = sum(
        0 if leaf.sharding.is_fully_replicated else 1
        for leaf in jax.tree_util.tree_leaves(sharded)
    )
    assert n_sharded > 50  # every Dense kernel + bilinear weight + table


def test_tp_matches_single_device():
    for direct in (True, False):
        cfg, model, variables, batch = _setup(direct_forces=direct)
        E0, F0, _ = energy_and_forces(model, variables, batch)
        mesh = make_mesh(2, axis_names=("tp",))
        sharded = shard_tp_variables(variables, mesh)
        ef = make_tp_energy_and_forces(model, mesh)
        E, F = ef(sharded, batch)
        np.testing.assert_allclose(np.asarray(E), np.asarray(E0),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(F), np.asarray(F0),
                                   rtol=2e-5, atol=2e-6)


def test_tp_gradients_match_and_stay_sharded():
    cfg, model, variables, batch = _setup(direct_forces=False)
    mesh = make_mesh(2, axis_names=("tp",))
    sharded = shard_tp_variables(variables, mesh)

    def loss_fn(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[:, None]
        am = b["atom_mask"].astype(jnp.float32)[:, None]
        return (
            jnp.sum(jnp.abs(E - b["E"]) * m)
            + jnp.sum(jnp.abs(F[:, 0, :] - b["F"]) * am)
        )

    lg = make_tp_loss_and_grad(model, mesh, loss_fn)
    loss, grads = lg(sharded, batch)

    def single_loss(params):
        E, F, _ = energy_and_forces(model, params, batch)
        return loss_fn(E, F, batch)

    ref_loss, ref_g = jax.value_and_grad(single_loss)(variables)
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_g["params"])[0]
    flat_tp = dict(jax.tree_util.tree_flatten_with_path(grads["params"])[0])
    for path, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_tp[path]), np.asarray(v), rtol=2e-4, atol=1e-5,
            err_msg=str(path),
        )
    # the gradient of a tp-sharded kernel is itself tp-sharded (optimizer
    # state stays 1/N per chip)
    gk = grads["params"]["atom_emb"]["embeddings"]
    assert not gk.sharding.is_fully_replicated


def test_tp_train_step_matches_single_device():
    """The FULL tp train step (tree-path optimizer under GSPMD) matches the
    single-device tree-path step over 3 steps; params AND Adam moments stay
    tp-sharded throughout."""
    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel.tp import (
        check_tp_opt_sharding,
        init_tp_state,
        make_tp_train_step,
    )
    from gemnet_pytorch_tpu.training import Trainer

    cfg, model, variables, batch = _setup(direct_forces=False)
    tcfg = TrainConfig(batch_size=2, weight_decay=2e-6, rho_force=0.9,
                       warmup_steps=2, flat_optimizer=False)
    mesh = make_mesh(2, axis_names=("tp",))

    tp_trainer = Trainer(model, tcfg)
    tp_state = init_tp_state(tp_trainer, dict(variables), mesh)
    check_tp_opt_sharding(tp_state.opt_state, tp_state.params, mesh)
    tp_step = make_tp_train_step(tp_trainer, mesh)

    ref_trainer = Trainer(model, tcfg)
    ref_state = ref_trainer.init_state(dict(variables))
    ref_step = ref_trainer.train_step_fn()

    lr = jnp.asarray(1.0)
    for _ in range(3):
        tp_state, tp_m, _ = tp_step(tp_state, batch, lr)
        ref_state, ref_m, _ = ref_step(ref_state, batch, lr)
        np.testing.assert_allclose(
            float(tp_m["loss"]), float(ref_m["loss"]), rtol=1e-5
        )

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_state.params)[0]
    flat_tp = dict(jax.tree_util.tree_flatten_with_path(tp_state.params)[0])
    # a handful of elements drift to ~5e-4 relative over the 3-step Adam
    # trajectory (fp reassociation of the GSPMD-partitioned reductions)
    for path, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_tp[path]), np.asarray(v), rtol=1e-3, atol=5e-6,
            err_msg=str(path),
        )
    flat_ema = dict(jax.tree_util.tree_flatten_with_path(tp_state.ema_params)[0])
    for path, v in jax.tree_util.tree_flatten_with_path(ref_state.ema_params)[0]:
        np.testing.assert_allclose(
            np.asarray(flat_ema[path]), np.asarray(v), rtol=1e-3, atol=5e-6,
            err_msg=str(path),
        )
    # moments stayed sharded after 3 updates (no silent replication)
    check_tp_opt_sharding(tp_state.opt_state, tp_state.params, mesh)
    k = tp_state.params["atom_emb"]["embeddings"]
    assert not k.sharding.is_fully_replicated
