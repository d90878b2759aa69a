"""Per-layer activation parity (BASELINE.md): intermediate h/m after every
interaction block, and the basis tensors, must match the torch reference
under the pretrained scaling factors — not just the final E/F."""

import numpy as np
import pytest

from conftest import add_reference_shims
from test_model_parity import SMALL, _batches, _reference_model

from gemnet_pytorch_tpu.config import ModelConfig


def test_per_block_activations_match_reference(synthetic_npz):
    import jax
    import jax.numpy as jnp
    import torch

    from gemnet_pytorch_tpu.compat import import_reference_state_dict
    from gemnet_pytorch_tpu.models import make_model

    ref_model = _reference_model(triplets_only=False, direct_forces=True)
    ref_inputs, batch, n_real = _batches(synthetic_npz, triplets_only=False)

    # capture h, m after each reference interaction block via forward hooks
    captured = {}

    def hook(i):
        def fn(module, args, output):
            h, m = output
            captured[f"block{i}_h"] = h.detach().numpy()
            captured[f"block{i}_m"] = m.detach().numpy()
        return fn

    for i, block in enumerate(ref_model.int_blocks):
        block.register_forward_hook(hook(i))
    ref_model(ref_inputs)

    cfg = ModelConfig(triplets_only=False, direct_forces=True, num_targets=1, **SMALL)
    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jbatch)
    state_dict = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = import_reference_state_dict(state_dict, dict(variables))

    # capture the same intermediates via flax capture_intermediates on the
    # interaction block outputs
    _, mods = model.apply(
        variables, jbatch,
        capture_intermediates=lambda mdl, _: bool(mdl.name) and mdl.name.startswith("int_blocks"),
        mutable=["intermediates"],
    )
    inter = mods["intermediates"]
    n_atoms = n_real["atoms"]
    nE = int(batch["edge_mask"].sum())
    for i in range(cfg.num_blocks):
        h, m = inter[f"int_blocks_{i}"]["__call__"][0]
        np.testing.assert_allclose(
            np.asarray(h)[:n_atoms], captured[f"block{i}_h"],
            rtol=5e-4, atol=5e-5, err_msg=f"h after block {i}",
        )
        np.testing.assert_allclose(
            np.asarray(m)[:nE], captured[f"block{i}_m"],
            rtol=5e-4, atol=5e-5, err_msg=f"m after block {i}",
        )
