"""Flat-vector optimizer (training/flat_opt.py) vs the optax tree path.

The flat layout is the TPU-native default (one contiguous buffer instead of
153 leaves; see flat_opt.py's module docstring for the measured rationale).
These tests pin the guarantee that makes it safe: over multiple real train
steps, the flat pipeline produces the SAME params/EMA trajectory as the
optax.chain(scale_shared_grads, clip_by_global_norm, multi_transform) path
it replaces, up to fp reduction order.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def two_trainers(synthetic_npz):
    """Two trainers on identical weights/config, one flat, one tree."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=2, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=False,  # energy-gradient forces:
        # exercises the double-backward grads the optimizer consumes
    )
    kw = dict(
        learning_rate=1e-3, warmup_steps=3, decay_steps=50, decay_rate=0.5,
        weight_decay=1e-3, rho_force=0.9, loss="rmse", grad_clip_max=0.5,
        ema_decay=0.9, batch_size=4,
    )
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=32, nval=8, batch_size=4, seed=0, pad_sample_batches=4)
    model = make_model(mcfg)
    batch = {k: jnp.asarray(v) for k, v in next(p.get_dataset("train")).items()}
    variables = dict(model.init(jax.random.PRNGKey(0), batch))

    t_flat = Trainer(model, TrainConfig(flat_optimizer=True, **kw))
    t_tree = Trainer(model, TrainConfig(flat_optimizer=False, **kw))
    assert t_flat.flat and not t_tree.flat
    s_flat = t_flat.init_state(variables)
    s_tree = t_tree.init_state(variables)
    batches = [next(p.get_dataset("train")) for _ in range(6)]
    return dict(t_flat=t_flat, t_tree=t_tree, s_flat=s_flat, s_tree=s_tree,
                batches=batches)


def test_flat_matches_tree_trajectory(two_trainers):
    """6 steps (warmup->decay crossover, lr_scale=0.5 on the last two):
    identical params, EMA, and loss trajectory in both layouts."""
    import jax

    t_flat, t_tree = two_trainers["t_flat"], two_trainers["t_tree"]
    s_flat, s_tree = two_trainers["s_flat"], two_trainers["s_tree"]
    for i, b in enumerate(two_trainers["batches"]):
        lr_scale = 0.5 if i >= 4 else 1.0
        s_flat, l_flat = t_flat.train_on_batch(s_flat, dict(b), lr_scale)
        s_tree, l_tree = t_tree.train_on_batch(s_tree, dict(b), lr_scale)
        assert float(l_flat) == pytest.approx(float(l_tree), rel=1e-5)

    p_flat = jax.device_get(t_flat.params_tree(s_flat))
    p_tree = jax.device_get(s_tree.params)
    flat_leaves = jax.tree_util.tree_leaves_with_path(p_flat)
    tree_leaves = dict(jax.tree_util.tree_leaves_with_path(p_tree))
    assert len(flat_leaves) == len(tree_leaves)
    for path, ours in flat_leaves:
        np.testing.assert_allclose(
            ours, tree_leaves[path], rtol=2e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))

    e_flat = jax.device_get(t_flat.ema_tree(s_flat))
    e_tree = jax.device_get(s_tree.ema_params)
    for path, ours in jax.tree_util.tree_leaves_with_path(e_flat):
        np.testing.assert_allclose(
            ours, dict(jax.tree_util.tree_leaves_with_path(e_tree))[path],
            rtol=2e-5, atol=1e-7, err_msg=jax.tree_util.keystr(path))


def test_flat_metric_accumulator_matches(two_trainers):
    """Device-side metric accumulation drains to the same sample-weighted
    values in the flat (n_metrics, 2)-array layout as the dict layout."""
    from gemnet_pytorch_tpu.training import Metrics

    t_flat, t_tree = two_trainers["t_flat"], two_trainers["t_tree"]
    s_flat, s_tree = two_trainers["s_flat"], two_trainers["s_tree"]
    for b in two_trainers["batches"][:3]:
        s_flat, _ = t_flat.train_on_batch(s_flat, dict(b), 1.0)
        s_tree, _ = t_tree.train_on_batch(s_tree, dict(b), 1.0)
    m_flat = Metrics("train", t_flat.tracked_metrics)
    m_tree = Metrics("train", t_tree.tracked_metrics)
    s_flat = t_flat.drain_metrics(s_flat, m_flat)
    s_tree = t_tree.drain_metrics(s_tree, m_tree)
    for key in t_flat.tracked_metrics:
        assert m_flat.result()[f"{key}_train"] == pytest.approx(
            m_tree.result()[f"{key}_train"], rel=1e-5), key
    # drained accumulators are zeroed in the flat layout too
    assert float(np.abs(np.asarray(s_flat.metric_acc)).sum()) == 0.0


def test_flat_checkpoint_roundtrip(two_trainers, tmp_path):
    """Orbax save/restore preserves the flat TrainState (vector params,
    FlatOptState masks) bit-exactly."""
    import jax

    from gemnet_pytorch_tpu.training.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    t_flat = two_trainers["t_flat"]
    s_flat = two_trainers["s_flat"]
    for b in two_trainers["batches"][:2]:
        s_flat, _ = t_flat.train_on_batch(s_flat, dict(b), 1.0)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, s_flat)
    restored, _ = restore_checkpoint(path, s_flat)
    for a, b in zip(jax.tree_util.tree_leaves(s_flat),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_matches_single_steps(two_trainers):
    """One K=4 scanned dispatch (multi_step_fn) is numerically identical to
    4 consecutive single train steps: same params, EMA, opt count, and
    device-side metric accumulator."""
    import jax
    import numpy as np

    t = two_trainers["t_flat"]
    s_single = two_trainers["s_flat"]
    s_multi = s_single
    batches = two_trainers["batches"][:4]

    for b in batches:
        s_single, _ = t.train_on_batch(s_single, dict(b), 1.0)
    s_multi, last_loss = t.train_on_batches(s_multi, [dict(b) for b in batches], 1.0)

    assert int(s_multi.step) == int(s_single.step)
    np.testing.assert_allclose(
        np.asarray(s_multi.params), np.asarray(s_single.params), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_multi.ema_params), np.asarray(s_single.ema_params), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_multi.metric_acc), np.asarray(s_single.metric_acc), rtol=1e-6)
    assert int(s_multi.opt_state.count) == int(s_single.opt_state.count)
    assert np.isfinite(float(last_loss))
