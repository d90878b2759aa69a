"""dp x pp composition (parallel/pp.py dp_axis): each dp row pipelines its
own microbatches over the pp stages on a 2-D (dp, pp) mesh; stage params
shard over pp and replicate over dp. Asserted against the monolithic
single-device model per (dp row, microbatch) — forward AND parameter
gradients including the -dE/dR double backward (round-3 verdict item 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from __graft_entry__ import _make_graphs, _pad, _shared_dims, _small_cfg
from gemnet_pytorch_tpu.models import energy_and_forces, make_model
from gemnet_pytorch_tpu.parallel.pp import (
    make_pp_energy_and_forces,
    make_pp_loss_and_grad,
    split_pp_variables,
    stack_microbatches,
)
from test_pp import _tiny_cfg


def _dp_pp_mesh(n_dp, n_pp):
    devs = np.array(jax.devices()[: n_dp * n_pp]).reshape(n_dp, n_pp)
    return Mesh(devs, axis_names=("dp", "pp"))


def _setup(cfg, n_dp, n_micro):
    model = make_model(cfg)
    tups = [
        _make_graphs(cfg, n_molecules=2, seed=7 * d + s, max_atoms=7)
        for d in range(n_dp)
        for s in range(n_micro)
    ]
    dims = _shared_dims(cfg, tups)
    shards = [_pad(cfg, t, dims) for t in tups]
    sample = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    # (DP, M, ...) stack: dp-major grouping of the microbatches
    rows = [
        stack_microbatches(shards[d * n_micro : (d + 1) * n_micro])
        for d in range(n_dp)
    ]
    batches = {
        k: jnp.asarray(np.stack([r[k] for r in rows])) for k in rows[0]
    }
    return model, variables, shards, batches


@pytest.mark.parametrize("direct_forces", [True, False])
def test_dp_pp_matches_single_device(direct_forces):
    cfg = _tiny_cfg(triplets_only=False, direct_forces=direct_forces)
    DP, M, S = 2, 3, 2
    model, variables, shards, batches = _setup(cfg, DP, M)
    mesh = _dp_pp_mesh(DP, S)
    pre, stage = split_pp_variables(variables, cfg.num_blocks, S)
    # shard the batch stack over dp (stage/pre placement is propagated)
    sh = NamedSharding(mesh, P("dp"))
    batches = {k: jax.device_put(v, sh) for k, v in batches.items()}
    ef = make_pp_energy_and_forces(model, mesh, M, dp_axis="dp")
    E, F = ef(pre, stage, batches)
    assert E.shape[:2] == (DP, M)
    for d in range(DP):
        for i in range(M):
            b = shards[d * M + i]
            bj = {k: jnp.asarray(v) for k, v in b.items()}
            Er, Fr, _ = energy_and_forces(model, variables, bj)
            np.testing.assert_allclose(np.asarray(E[d, i]), np.asarray(Er),
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(np.asarray(F[d, i]), np.asarray(Fr),
                                       rtol=2e-5, atol=2e-6)


def test_dp_pp_gradients_match_single_device():
    """Pre+stage parameter gradients of a masked loss over the full
    (DP, M) batch stack — with the -dE/dR force term's double backward —
    equal the summed monolithic single-device gradients."""
    cfg = _tiny_cfg(triplets_only=False, direct_forces=False)
    DP, M, S = 2, 2, 2
    model, variables, shards, batches = _setup(cfg, DP, M)
    mesh = _dp_pp_mesh(DP, S)
    pre, stage = split_pp_variables(variables, cfg.num_blocks, S)
    sh = NamedSharding(mesh, P("dp"))
    batches = {k: jax.device_put(v, sh) for k, v in batches.items()}

    def loss_fn(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[..., None]
        am = b["atom_mask"].astype(jnp.float32)[..., None]
        return (
            jnp.sum(jnp.abs(E - b["E"]) * m)
            + jnp.sum(jnp.abs(F[..., 0, :] - b["F"]) * am)
        )

    lg = make_pp_loss_and_grad(model, mesh, loss_fn, M, dp_axis="dp")
    loss, (gpre, gstage) = lg(pre, stage, batches)

    def mono_loss(vs):
        total = 0.0
        for b in shards:
            bj = {k: jnp.asarray(v) for k, v in b.items()}
            E, F, _ = energy_and_forces(model, vs, bj)
            total = total + loss_fn(E, F, bj)
        return total

    mono_val, mono_grads = jax.value_and_grad(mono_loss)(dict(variables))
    np.testing.assert_allclose(float(loss), float(mono_val), rtol=2e-5)

    from gemnet_pytorch_tpu.parallel.pp import merge_pp_variables

    merged = merge_pp_variables(gpre, gstage, cfg.num_blocks, S)
    flat_mono = jax.tree_util.tree_flatten_with_path(mono_grads["params"])[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(merged["params"])[0])
    assert len(flat_pp) == len(flat_mono)
    # fp reassociation across the pipeline's psum/ppermute (same envelope as
    # tests/test_pp.py::test_pp_gradients_match_single_device)
    for path, v in flat_mono:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(v), rtol=2e-3, atol=1e-4,
            err_msg=str(path),
        )
