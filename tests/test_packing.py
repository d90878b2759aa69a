"""BatchPacker: pack/unpack roundtrip across dtypes, layout stability, and
equality of packed vs dict train steps."""

import numpy as np
import pytest


def test_pack_unpack_roundtrip(synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.training.trainer import UNUSED_DEVICE_KEYS, BatchPacker

    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=16, nval=4, batch_size=4, seed=0, pad_sample_batches=2)
    it = p.get_dataset("train", prefetch_workers=0)
    batch = next(it)

    packer = BatchPacker()
    packed = packer.pack(batch)
    # int32 buffer: 4-byte keys unpack by same-width bitcast with no tiled
    # (n, itemsize) relayout on TPU (see BatchPacker docstring)
    assert packed.dtype == np.int32

    unpacked = jax.jit(packer.unpack)(jnp.asarray(packed))
    for k, v in batch.items():
        if k in UNUSED_DEVICE_KEYS:
            assert k not in unpacked
            continue
        got = np.asarray(unpacked[k])
        assert got.shape == v.shape, k
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got, v, err_msg=k)

    # second batch reuses the frozen layout
    packed2 = packer.pack(next(it))
    assert packed2.shape == packed.shape


def test_packed_step_equals_dict_step(synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer, DataProvider
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer
    from gemnet_pytorch_tpu.training.trainer import device_batch

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    p = DataProvider(c, ntrain=16, nval=4, batch_size=4, seed=0, pad_sample_batches=2)
    it = p.get_dataset("train", prefetch_workers=0)
    batch = next(it)
    model = make_model(mcfg)
    jbatch = device_batch(batch)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jbatch))
    trainer = Trainer(model, TrainConfig(weight_decay=1e-6, loss="mae", rho_force=0.5))
    state = trainer.init_state(variables)
    step = trainer.train_step_fn()

    lr = jnp.asarray(1.0)
    _, m_dict, _ = step(state, jbatch, lr)
    packed = jnp.asarray(trainer.packer.pack(batch))
    _, m_packed, _ = step(state, packed, lr)
    np.testing.assert_allclose(
        float(m_dict["loss"]), float(m_packed["loss"]), rtol=1e-6
    )
