"""Train-step parity vs the reference Trainer.

Runs one/two reference `Trainer.train_on_batch` steps
(/root/reference/gemnet/training/trainer.py:325-408: global-norm clip,
shared-grad scaling, AdamW+Adam split, warmup-exp schedule, EMA) against this
framework's jitted train step on identical weights and an identical batch,
and compares post-scaling gradients, losses across steps, updated params and
EMA shadows. This closes the gap between "activations allclose"
(test_model_parity / test_activation_parity) and *training* parity: any drift
in loss weighting, lr schedule, optimizer partition, shared-grad scaling, or
EMA shows up here.
"""

import numpy as np
import pytest

from conftest import add_reference_shims
from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig

from test_model_parity import SMALL, _batches, _reference_model

HP = dict(
    learning_rate=1e-3,
    decay_steps=100.0,
    decay_rate=0.5,
    warmup_steps=10,
    weight_decay=2e-6,
    grad_clip_max=10.0,
    ema_decay=0.9,
    rho_force=0.9,
)


def _ref_trainer(ref_model, loss):
    add_reference_shims()
    from gemnet.training.trainer import Trainer as RefTrainer

    return RefTrainer(
        ref_model,
        learning_rate=HP["learning_rate"],
        decay_steps=HP["decay_steps"],
        decay_rate=HP["decay_rate"],
        warmup_steps=HP["warmup_steps"],
        weight_decay=HP["weight_decay"],
        staircase=False,
        grad_clip_max=HP["grad_clip_max"],
        ema_decay=HP["ema_decay"],
        rho_force=HP["rho_force"],
        loss=loss,
        mve=False,
        agc=False,
    )


def _split_targets(ref_batch):
    inputs = {k: v for k, v in ref_batch.items() if k not in ("E", "F")}
    targets = {k: ref_batch[k] for k in ("E", "F")}
    return inputs, targets


def _ref_grads(ref_model):
    return {
        name: p.grad.detach().numpy().copy()
        for name, p in ref_model.named_parameters()
        if p.grad is not None
    }


def _our_value(tree, path):
    node = tree
    for part in path:
        node = node[part]
    return np.asarray(node)


@pytest.mark.parametrize(
    "triplets_only,loss", [(True, "rmse"), (False, "mae")], ids=["T", "Q"]
)
def test_train_step_parity(synthetic_npz, triplets_only, loss):
    import jax
    import jax.numpy as jnp
    import optax

    add_reference_shims()
    from gemnet.training.metrics import Metrics as RefMetrics
    from gemnet_pytorch_tpu.compat import import_reference_state_dict
    from gemnet_pytorch_tpu.compat.torch_import import map_reference_name
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer
    from gemnet_pytorch_tpu.training.trainer import scale_shared_grads

    # canonical double-backward variant (direct_forces=False)
    ref_model = _reference_model(triplets_only, direct_forces=False)
    ref_inputs, batch, n_real = _batches(synthetic_npz, triplets_only)
    inputs, targets = _split_targets(ref_inputs)

    cfg = ModelConfig(
        triplets_only=triplets_only, direct_forces=False, num_targets=1, **SMALL
    )
    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(model.init(jax.random.PRNGKey(0), jbatch))
    # .copy() is load-bearing: .numpy() views share memory with the torch
    # params, which the reference optimizer.step() mutates IN PLACE below
    state_dict = {
        k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()
    }
    variables = import_reference_state_dict(state_dict, variables)

    tcfg = TrainConfig(loss=loss, mve=False, agc=False, staircase=False, **HP)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)

    # ---- gradient parity (after shared-grad scaling, before optimizer) ----
    ref_trainer = _ref_trainer(ref_model, loss)
    metrics = RefMetrics("train", ref_trainer.tracked_metrics)
    it = iter([(inputs, targets), (inputs, targets)])
    ref_loss1 = float(ref_trainer.train_on_batch(it, metrics))
    ref_grads = _ref_grads(ref_model)  # post scale_shared_grads + clip

    ptree = trainer.params_tree(state)  # structured view of the flat master
    (our_loss1, _), raw_grads = jax.value_and_grad(
        lambda p: trainer._loss_and_metrics(p, state.scales, jbatch), has_aux=True
    )(ptree)
    pre = optax.chain(
        scale_shared_grads(cfg), optax.clip_by_global_norm(HP["grad_clip_max"])
    )
    our_grads, _ = pre.update(raw_grads, pre.init(ptree), ptree)

    assert float(our_loss1) == pytest.approx(ref_loss1, rel=2e-4)

    gscale = max(
        np.abs(g).max() for g in ref_grads.values() if g.size
    )
    checked = 0
    for name, ref_g in ref_grads.items():
        mapped = map_reference_name(name.replace(".seq_energy.", ".layers."))
        if mapped is None or mapped[0] != "params":
            continue
        _, path, transpose = mapped
        ours = _our_value(our_grads, path)
        if transpose:
            ours = ours.T
        np.testing.assert_allclose(
            ours, ref_g, rtol=5e-3, atol=2e-4 * gscale + 1e-9, err_msg=name
        )
        checked += 1
    assert checked > 30

    # ---- one full step: updated params + EMA + second-step loss ----
    state, our_loss1b = trainer.train_on_batch(state, batch, 1.0)
    assert float(our_loss1b) == pytest.approx(ref_loss1, rel=2e-4)

    ref_after = {
        name: p.detach().numpy().copy()
        for name, p in ref_model.named_parameters()
    }
    ref_ema = {
        name: s.detach().numpy().copy()
        for (name, _), s in zip(
            [(n, p) for n, p in ref_model.named_parameters() if p.requires_grad],
            ref_trainer.exp_decay.shadow_params,
        )
    }
    before = {
        name: v for name, v in state_dict.items()
    }
    step_scale = HP["learning_rate"] / HP["warmup_steps"]  # first-step lr
    params_after = jax.device_get(trainer.params_tree(state))
    ema_after = jax.device_get(trainer.ema_tree(state))
    for name, ref_p in ref_after.items():
        mapped = map_reference_name(name.replace(".seq_energy.", ".layers."))
        if mapped is None or mapped[0] != "params":
            continue
        _, path, transpose = mapped
        ours = _our_value(params_after, path)
        ours_ema = _our_value(ema_after, path)
        if transpose:
            ours = ours.T
            ours_ema = ours_ema.T
        # updated params agree to a small fraction of the first-step lr
        np.testing.assert_allclose(
            ours, ref_p, rtol=0, atol=0.05 * step_scale + 2e-6, err_msg=name
        )
        if name in ref_ema:
            np.testing.assert_allclose(
                ours_ema, ref_ema[name], rtol=0, atol=0.05 * step_scale + 2e-6,
                err_msg="ema:" + name,
            )

    # ---- step 2 (schedule advanced): loss computed on updated params ----
    ref_loss2 = float(ref_trainer.train_on_batch(it, metrics))
    state, our_loss2 = trainer.train_on_batch(state, batch, 1.0)
    assert float(our_loss2) == pytest.approx(ref_loss2, rel=5e-4)
