"""End-to-end numerical parity: GemNet-(d)T/(d)Q vs the PyTorch reference.

Runs the reference model (via shims) and this framework's model on the same
molecules with identical weights (imported through compat.torch_import) and
the reference's pretrained scaling factors, then compares per-molecule
energies and per-atom forces — both the direct force head and the
energy-gradient path. This is the BASELINE.md "per-layer activations
allclose" requirement collapsed to the model surface; basis/layer-level
parity is covered in test_basis.py / test_layers_parity.py.
"""

import numpy as np
import pytest

from conftest import add_reference_shims
from gemnet_pytorch_tpu.config import ModelConfig
from gemnet_pytorch_tpu.data.containers import DataContainer
from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch

SCALE_FILE = "/root/reference/pretrained/scaling_factors.json"

SMALL = dict(
    num_spherical=4,
    num_radial=4,
    num_blocks=2,
    emb_size_atom=32,
    emb_size_edge=32,
    emb_size_trip=16,
    emb_size_quad=8,
    emb_size_rbf=8,
    emb_size_cbf=8,
    emb_size_sbf=8,
    emb_size_bil_quad=8,
    emb_size_bil_trip=16,
    num_before_skip=1,
    num_after_skip=1,
    num_concat=1,
    num_atom=2,
    cutoff=5.0,
    int_cutoff=10.0,
    envelope_exponent=5,
    extensive=True,
    output_init="HeOrthogonal",
    activation="swish",
)


def _reference_model(triplets_only, direct_forces, forces_coupled=False):
    return _reference_model_kw(
        triplets_only=triplets_only, direct_forces=direct_forces,
        forces_coupled=forces_coupled, **SMALL,
    )


def _reference_model_kw(**kwargs):
    add_reference_shims()
    import torch

    from gemnet.model.gemnet import GemNet as RefGemNet

    torch.manual_seed(1234)
    return RefGemNet(num_targets=1, scale_file=SCALE_FILE, **kwargs)


def _batches(synthetic_npz, triplets_only):
    """Same molecules through the reference container (torch inputs) and this
    framework's padded pipeline."""
    add_reference_shims()
    from gemnet.training.data_container import DataContainer as RefContainer

    idx = [0, 1, 2, 3]
    ref_c = RefContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only)
    ref_inputs = ref_c[idx]

    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only)
    g, Z, R, E, F = c.build(idx)
    dims = PadDims(
        n_mol=len(idx) + 2,
        n_atoms=len(Z) + 10,
        n_edges=g.n_edges + 64,
        n_triplets=g.n_triplets + 64,
        kmax3=g.kmax3 + 2,
        n_int_edges=0 if triplets_only else g.n_int_edges + 16,
        n_intm=0 if triplets_only else g.n_intm + 32,
        n_quads=0 if triplets_only else g.n_quads + 64,
        kmax4=0 if triplets_only else g.kmax4 + 2,
    )
    batch = pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=triplets_only)
    n_real = dict(mol=len(idx), atoms=len(Z))
    return ref_inputs, batch, n_real


@pytest.mark.parametrize(
    "triplets_only,direct_forces",
    [(True, True), (True, False), (False, True), (False, False)],
    ids=["dT", "T", "dQ", "Q"],
)
def test_model_parity(synthetic_npz, triplets_only, direct_forces):
    import jax
    import jax.numpy as jnp
    import torch

    from gemnet_pytorch_tpu.models import make_model, energy_and_forces
    from gemnet_pytorch_tpu.compat import import_reference_state_dict

    ref_model = _reference_model(triplets_only, direct_forces)
    ref_inputs, batch, n_real = _batches(synthetic_npz, triplets_only)

    ref_E, ref_F = ref_model(ref_inputs)
    ref_E = ref_E.detach().numpy()
    ref_F = ref_F.detach().numpy()

    cfg = ModelConfig(
        triplets_only=triplets_only, direct_forces=direct_forces, num_targets=1, **SMALL
    )
    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jbatch)
    state_dict = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = import_reference_state_dict(state_dict, dict(variables))

    E, F, _ = energy_and_forces(model, variables, jbatch)
    E = np.asarray(E)[: n_real["mol"]]
    F = np.asarray(F)

    np.testing.assert_allclose(E, ref_E, rtol=2e-4, atol=2e-4)

    if direct_forces:
        mine_F = F[: n_real["atoms"]]  # (nAtoms, 1, 3)
        np.testing.assert_allclose(mine_F, ref_F, rtol=2e-4, atol=2e-4)
    else:
        mine_F = F[: n_real["atoms"], 0, :]
        np.testing.assert_allclose(mine_F, ref_F, rtol=5e-4, atol=5e-4)


def test_forces_coupled_nonextensive_parity(synthetic_npz):
    """forces_coupled=True undirected mean coupling (reference gemnet.py:588-592)
    and extensive=False per-molecule mean energies (gemnet.py:583) in one
    reference comparison."""
    import jax
    import jax.numpy as jnp
    import torch

    from gemnet_pytorch_tpu.models import make_model, energy_and_forces
    from gemnet_pytorch_tpu.compat import import_reference_state_dict

    small = dict(SMALL, extensive=False)
    ref_model = _reference_model_kw(
        triplets_only=True, direct_forces=True, forces_coupled=True, **small
    )
    ref_inputs, batch, n_real = _batches(synthetic_npz, True)
    ref_E, ref_F = ref_model(ref_inputs)

    cfg = ModelConfig(
        triplets_only=True, direct_forces=True, forces_coupled=True, num_targets=1,
        **small,
    )
    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jbatch)
    state_dict = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = import_reference_state_dict(state_dict, dict(variables))
    E, F, _ = energy_and_forces(model, variables, jbatch)
    np.testing.assert_allclose(
        np.asarray(E)[: n_real["mol"]], ref_E.detach().numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(F)[: n_real["atoms"]], ref_F.detach().numpy(), rtol=2e-4, atol=2e-4
    )
