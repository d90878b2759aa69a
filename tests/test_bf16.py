"""bf16 mixed-precision mode (ModelConfig.compute_dtype="bfloat16"):
layers compute in bf16, master params / geometry / basis generation /
reductions stay fp32, outputs and gradients return fp32. No reference
counterpart (the reference is fp32-only); numerics are characterized
against the fp32 model at loose tolerance."""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule
    from gemnet_pytorch_tpu.models import make_model

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=2, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        direct_forces=False,
    )
    rng = np.random.default_rng(0)
    mols = [random_molecule(rng, int(rng.integers(6, 10))) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff)
    dims = PadDims(
        n_mol=4, n_atoms=48, n_edges=512, n_triplets=2048, kmax3=16,
        n_int_edges=512, n_intm=2048, n_quads=8192, kmax4=64,
    ).grow_to(_scale_graph_dims(g, 1.1), 4, len(Z))
    batch = {
        k: jnp.asarray(v)
        for k, v in pad_batch(g, Z, R, dims, E=E, F=F).items()
    }
    model = make_model(cfg)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), batch))
    return cfg, model, variables, batch


def test_bf16_forward_close_to_fp32(setup):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg, model, variables, batch = setup
    E32, F32, _ = energy_and_forces(model, variables, batch)
    model16 = make_model(dataclasses.replace(cfg, compute_dtype="bfloat16"))
    E16, F16, _ = energy_and_forces(model16, variables, batch)
    # outputs are fp32 regardless of compute dtype
    assert E16.dtype == jnp.float32 and F16.dtype == jnp.float32
    E32, F32, E16, F16 = map(np.asarray, (E32, F32, E16, F16))
    scale_E = max(np.abs(E32).max(), 1e-9)
    scale_F = max(np.abs(F32).max(), 1e-9)
    # bf16 has ~2-3 decimal digits; per-layer rounding compounds over blocks
    assert np.abs(E16 - E32).max() / scale_E < 0.03
    assert np.abs(F16 - F32).max() / scale_F < 0.05


def test_bf16_params_stay_fp32_and_grads_fp32(setup):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg, _, variables, batch = setup
    model16 = make_model(dataclasses.replace(cfg, compute_dtype="bfloat16"))
    # init in bf16 mode still stores fp32 master params
    v16 = dict(jax.jit(model16.init)(jax.random.PRNGKey(0), batch))
    for leaf in jax.tree_util.tree_leaves(v16["params"]):
        assert leaf.dtype == jnp.float32

    def loss(p):
        E, F, _ = energy_and_forces(
            model16, {"params": p, **{k: v for k, v in variables.items()
                                      if k != "params"}}, batch)
        return jnp.sum(jnp.abs(E)) + jnp.sum(jnp.abs(F))

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_train_step(setup):
    """Full jitted train step in bf16 mode: finite loss, fp32 optimizer
    state, loss decreases over a few steps."""
    import jax

    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg, _, variables, batch = setup
    model16 = make_model(dataclasses.replace(cfg, compute_dtype="bfloat16"))
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, num_steps=100,
                       loss="rmse")
    trainer = Trainer(model16, tcfg)
    state = trainer.init_state(variables)
    losses = []
    for _ in range(5):
        state, loss = trainer.train_on_batch(state, batch, 1.0)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == np.float32
