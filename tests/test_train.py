"""Training stack: optimizer partition, schedule parity, loss masking,
train-step convergence, EMA, checkpoints, plateau decay, scale fitting."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup(synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=5, decay_steps=1e6, decay_rate=0.9,
        weight_decay=1e-6, rho_force=0.5, loss="mae", grad_clip_max=10.0,
        ema_decay=0.9, batch_size=4,
    )
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=32, nval=8, batch_size=4, seed=0, pad_sample_batches=4)
    it = p.get_dataset("train")
    model = make_model(mcfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    variables = dict(model.init(jax.random.PRNGKey(0), batch))
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    return dict(model=model, trainer=trainer, state=state, it=it, mcfg=mcfg, tcfg=tcfg)


def test_schedule_matches_reference():
    """Warmup-exp-decay matches the reference LambdaLR formula
    (schedules.py:37-44) including staircase."""
    from gemnet_pytorch_tpu.training.schedules import linear_warmup_exponential_decay

    for staircase in (False, True):
        sched = linear_warmup_exponential_decay(10, 100, 0.5, staircase)
        for step in [0, 1, 5, 9, 10, 50, 150, 1000]:
            warmup = min(1 / 10 + step / 10, 1)
            exponent = step / 100
            if staircase:
                exponent = int(exponent)
            expected = warmup * 0.5**exponent
            np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_param_partition(tiny_setup):
    """atom_emb/frequencies/bias go to Adam; everything else AdamW
    (reference trainer.py:118-129)."""
    import jax

    from gemnet_pytorch_tpu.training.trainer import _param_label

    params = tiny_setup["trainer"].params_tree(tiny_setup["state"])
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path), params
    )
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    adam_paths = ["/".join(str(getattr(k, "key", k)) for k in p)
                  for p, lab in flat if lab == "adam"]
    assert any("atom_emb" in p for p in adam_paths)
    assert any("frequencies" in p for p in adam_paths)
    assert all(("atom_emb" in p) or ("frequencies" in p) or ("bias" in p)
               for p in adam_paths)
    n_adamw = sum(1 for _, lab in flat if lab == "adamw")
    assert n_adamw > len(adam_paths)


def test_loss_decreases(tiny_setup):
    from gemnet_pytorch_tpu.training import Metrics

    trainer, state, it = tiny_setup["trainer"], tiny_setup["state"], tiny_setup["it"]
    metrics = Metrics("train", trainer.tracked_metrics)
    losses = []
    for i in range(30):
        state, loss = trainer.train_on_batch(state, next(it), 1.0, metrics)
        losses.append(loss)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    tiny_setup["state"] = state


def test_ema_differs_and_tracks(tiny_setup):
    import jax

    state = tiny_setup["state"]
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, state.ema_params,
    )
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert max_diff > 0, "EMA should lag params after training"


def test_eval_with_ema(tiny_setup):
    from gemnet_pytorch_tpu.training import Metrics

    trainer, state, it = tiny_setup["trainer"], tiny_setup["state"], tiny_setup["it"]
    m = Metrics("val", trainer.tracked_metrics)
    loss = trainer.test_on_batch(state, next(it), m, use_ema=True)
    assert np.isfinite(loss)
    assert m.loss == pytest.approx(loss, rel=1e-6)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    import jax

    from gemnet_pytorch_tpu.training import (
        PlateauState, restore_checkpoint, save_checkpoint,
    )

    state = tiny_setup["state"]
    plateau = PlateauState(factor=0.5, patience=2, cooldown=1)
    plateau.step(1.0)
    plateau.step(2.0)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, plateau)

    # fresh state with same structure
    trainer = tiny_setup["trainer"]
    fresh = jax.tree_util.tree_map(lambda x: np.zeros_like(x), state)
    restored, plateau2 = restore_checkpoint(path, fresh, PlateauState())
    np.testing.assert_array_equal(np.asarray(restored.step), np.asarray(state.step))
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert plateau2.num_bad_steps == plateau.num_bad_steps


def test_plateau_decay():
    from gemnet_pytorch_tpu.training import PlateauState

    p = PlateauState(factor=0.5, patience=2, cooldown=1)
    scale = 1.0
    for loss in [1.0, 0.9, 0.95, 0.95, 0.95]:  # 3 bad steps after best=0.9
        scale = p.step(loss)
    assert scale == 0.5
    # cooldown absorbs the next bad step
    scale = p.step(0.95)
    assert scale == 0.5


def test_shared_grad_scaling(tiny_setup):
    """Shared-layer grads divided by num_blocks (+1 for rbf_out)."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.training.trainer import scale_shared_grads

    mcfg = tiny_setup["mcfg"]
    tx = scale_shared_grads(mcfg)
    params = tiny_setup["trainer"].params_tree(tiny_setup["state"])
    ones = __import__("jax").tree_util.tree_map(jnp.ones_like, params)
    scaled, _ = tx.update(ones, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(scaled["mlp_rbf3"]["Dense_0"]["kernel"]),
        1.0 / mcfg.num_blocks,
    )
    np.testing.assert_allclose(
        np.asarray(scaled["mlp_rbf_out"]["Dense_0"]["kernel"]),
        1.0 / (mcfg.num_blocks + 1),
    )
    np.testing.assert_allclose(
        np.asarray(scaled["edge_emb"]["dense"]["Dense_0"]["kernel"]), 1.0
    )


def test_fit_scaling_smoke(tiny_setup, tmp_path):
    """Fitting drives post-scale output variance toward input variance."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models.scaling import scales_to_dict
    from gemnet_pytorch_tpu.training.fit_scaling import fit_scaling_factors

    model, state, it = tiny_setup["model"], tiny_setup["state"], tiny_setup["it"]
    trainer = tiny_setup["trainer"]
    variables = {"params": trainer.params_tree(state), "scale_factors": state.scales}
    scale_file = str(tmp_path / "scales.json")
    out = fit_scaling_factors(
        model, variables, it, n_batches=2, scale_file=scale_file
    )
    fitted = scales_to_dict(out["scale_factors"])
    assert len(fitted) == 3 * 1 + 2 * 2  # 3 per int block + 2 per out block (direct)
    assert all(np.isfinite(v) and v > 0 for v in fitted.values())
    # file written with same keys
    import json

    with open(scale_file) as f:
        data = json.load(f)
    assert set(fitted).issubset(set(data))


def test_drain_metrics_sample_weighted(tiny_setup):
    """Multi-interval drains aggregate weighted by sample counts, not per
    drain (reference metrics.py:66-79)."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.training import Metrics

    trainer, state = tiny_setup["trainer"], tiny_setup["state"]
    metrics = Metrics("train", trainer.tracked_metrics)
    acc1 = {k: jnp.zeros(2, jnp.float32) for k in trainer.tracked_metrics}
    # interval 1: loss mean 2.0 over weight 10; interval 2: 8.0 over weight 30
    acc1["loss"] = jnp.asarray([20.0, 10.0])
    state = trainer.drain_metrics(state.replace(metric_acc=acc1), metrics)
    acc2 = {k: jnp.zeros(2, jnp.float32) for k in trainer.tracked_metrics}
    acc2["loss"] = jnp.asarray([240.0, 30.0])
    state = trainer.drain_metrics(state.replace(metric_acc=acc2), metrics)
    # sample-weighted mean: (20+240)/(10+30) = 6.5, NOT (2+8)/2 = 5
    assert metrics.loss == pytest.approx(6.5)
    # accumulators reset after drain
    assert float(state.metric_acc["loss"][1]) == 0.0


def test_agc_compat_reference():
    """agc_compat_reference reproduces the reference's inverted selection
    (trainer.py:192-198: ONLY out_energy/out_forces clipped); the default
    follows the NFNet intent (everything EXCEPT the heads clipped)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.training.trainer import adaptive_gradient_clip

    params = {
        "dense": {"kernel": jnp.ones((4, 4)) * 0.01},
        "out_energy": {"kernel": jnp.ones((4, 1)) * 0.01},
    }
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 100.0, params)

    for compat in (False, True):
        tx = adaptive_gradient_clip(0.05, compat_reference=compat)
        out, _ = tx.update(grads, tx.init(params), params)
        dense_clipped = float(out["dense"]["kernel"].max()) < 100.0
        head_clipped = float(out["out_energy"]["kernel"].max()) < 100.0
        if compat:
            assert head_clipped and not dense_clipped
        else:
            assert dense_clipped and not head_clipped


def test_mve_training(synthetic_npz):
    """MVE loss path (num_targets=2, softplus variance, NLL)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Metrics, Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True, num_targets=2,
    )
    tcfg = TrainConfig(mve=True, rho_force=0.5, batch_size=4, weight_decay=1e-6)
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=16, nval=4, batch_size=4, seed=0, pad_sample_batches=2)
    it = p.get_dataset("train")
    model = make_model(mcfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    variables = dict(model.init(jax.random.PRNGKey(0), batch))
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    metrics = Metrics("train", trainer.tracked_metrics)
    state, loss = trainer.train_on_batch(state, next(it), 1.0, metrics)
    assert np.isfinite(loss)
    assert "energy_nll" in metrics.result(False)


def test_multitarget_autograd_forces(synthetic_npz):
    """num_targets=2 with energy-gradient forces: per-target grad loop
    (reference gemnet.py:600-609)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=False, num_targets=2,
    )
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=8, nval=4, batch_size=4, seed=0, pad_sample_batches=2)
    batch = {k: jnp.asarray(v) for k, v in next(p.get_dataset("train", prefetch_workers=0)).items()}
    model = make_model(mcfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    E, F, _ = energy_and_forces(model, variables, batch)
    assert E.shape[1] == 2
    assert F.shape[1:] == (2, 3)
    assert np.isfinite(np.asarray(E)).all() and np.isfinite(np.asarray(F)).all()


def test_train_step_deterministic(synthetic_npz):
    """Same seed + same batch -> bitwise-identical loss trajectory."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    tcfg = TrainConfig(weight_decay=1e-6, loss="mae", rho_force=0.5, batch_size=4)
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)

    def run():
        p = DataProvider(c, ntrain=16, nval=4, batch_size=4, seed=7,
                         pad_sample_batches=2)
        it = p.get_dataset("train", prefetch_workers=0)
        model = make_model(mcfg)
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        variables = dict(jax.jit(model.init)(jax.random.PRNGKey(11), batch))
        trainer = Trainer(model, tcfg)
        state = trainer.init_state(variables)
        losses = []
        for _ in range(5):
            state, loss = trainer.train_on_batch(state, next(it), 1.0)
            losses.append(float(loss))
        return losses

    np.testing.assert_array_equal(run(), run())
