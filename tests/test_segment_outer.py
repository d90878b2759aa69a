"""segment_outer_sum / segment_gather_contract: XLA oracle vs Pallas
(interpret mode on CPU), VJP correctness, and second-order differentiation."""

import numpy as np
import pytest


def _make_case(rng, n_rows=1500, n_segments=128, S=7, M=16, pad_to=2048):
    ids = np.sort(rng.integers(0, n_segments - 5, size=n_rows)).astype(np.int32)
    a = rng.normal(size=(pad_to, S)).astype(np.float32)
    b = rng.normal(size=(pad_to, M)).astype(np.float32)
    mask = np.arange(pad_to) < n_rows
    ids_p = np.concatenate([ids, np.full(pad_to - n_rows, n_segments - 1, np.int32)])
    b = b * mask[:, None]  # caller masks one side
    from gemnet_pytorch_tpu.data.padding import EDGE_BLOCK

    bounds = np.arange(0, n_segments + EDGE_BLOCK, EDGE_BLOCK)
    splits = np.searchsorted(ids_p, bounds, side="left").astype(np.int32)
    return a, b, ids_p, splits, n_segments


def _oracle(a, b, ids, n_segments):
    out = np.zeros((n_segments, a.shape[1], b.shape[1]), np.float32)
    for t in range(len(ids)):
        out[ids[t]] += np.outer(a[t], b[t])
    return out.transpose(1, 0, 2)  # kernel-native (S, E, M) layout


def test_xla_outer_sum_matches_oracle(rng):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas.segment_outer import segment_outer_sum

    a, b, ids, splits, E = _make_case(rng, n_rows=300, pad_to=512, n_segments=64)
    out = np.asarray(
        segment_outer_sum(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids),
                          jnp.asarray(splits), E, "xla")
    )
    np.testing.assert_allclose(out, _oracle(a, b, ids, E), rtol=1e-5, atol=1e-5)


def test_pallas_interpret_matches_xla(rng):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas.segment_outer import (
        _outer_sum_pallas, _outer_sum_xla,
    )

    a, b, ids, splits, E = _make_case(rng)
    ref = np.asarray(_outer_sum_xla(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(ids), E))
    out = np.asarray(
        _outer_sum_pallas(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids),
                          jnp.asarray(splits), E, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_gather_contract_interpret_matches_xla(rng):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas.segment_outer import (
        _gather_contract_pallas, _gather_contract_xla,
    )

    a, b, ids, splits, E = _make_case(rng)
    cot = rng.normal(size=(a.shape[1], E, b.shape[1])).astype(np.float32)
    ref_da, ref_db = _gather_contract_xla(jnp.asarray(cot), jnp.asarray(a),
                                          jnp.asarray(b), jnp.asarray(ids))
    da, db = _gather_contract_pallas(jnp.asarray(cot), jnp.asarray(a),
                                     jnp.asarray(b), jnp.asarray(ids),
                                     jnp.asarray(splits), interpret=True)
    np.testing.assert_allclose(np.asarray(da), np.asarray(ref_da), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(ref_db), rtol=1e-4, atol=1e-4)


def test_vjp_matches_autodiff_of_xla(rng):
    """custom VJP == jax autodiff of the plain XLA formulation."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas.segment_outer import (
        _outer_sum_xla, segment_outer_sum,
    )

    a, b, ids, splits, E = _make_case(rng, n_rows=300, pad_to=512, n_segments=64)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    jids, jsplits = jnp.asarray(ids), jnp.asarray(splits)
    w = jnp.asarray(rng.normal(size=(a.shape[1], E, b.shape[1])).astype(np.float32))

    def f_custom(a, b):
        return jnp.sum(segment_outer_sum(a, b, jids, jsplits, E, "xla") * w)

    def f_plain(a, b):
        return jnp.sum(_outer_sum_xla(a, b, jids, E) * w)

    g_custom = jax.grad(f_custom, argnums=(0, 1))(ja, jb)
    g_plain = jax.grad(f_plain, argnums=(0, 1))(ja, jb)
    for gc, gp in zip(g_custom, g_plain):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-4, atol=1e-5)


def test_second_order_differentiation(rng):
    """grad-of-grad through the custom-VJP pair (force-training path)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas.segment_outer import (
        _outer_sum_xla, segment_outer_sum,
    )

    a, b, ids, splits, E = _make_case(rng, n_rows=100, pad_to=128, n_segments=32, S=3, M=4)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    jids, jsplits = jnp.asarray(ids), jnp.asarray(splits)

    def loss_custom(a):
        out = segment_outer_sum(a, jb, jids, jsplits, E, "xla")
        g = jax.grad(lambda a2: jnp.sum(out * 0 + segment_outer_sum(
            a2, jb, jids, jsplits, E, "xla") ** 2))(a)
        return jnp.sum(g**2)

    def loss_plain(a):
        g = jax.grad(lambda a2: jnp.sum(_outer_sum_xla(a2, jb, jids, E) ** 2))(a)
        return jnp.sum(g**2)

    gg_custom = jax.grad(loss_custom)(ja)
    gg_plain = jax.grad(loss_plain)(ja)
    np.testing.assert_allclose(
        np.asarray(gg_custom), np.asarray(gg_plain), rtol=1e-3, atol=1e-4
    )


def test_split3_interpret_matches_xla(rng):
    """Manual 3-pass fp32 mode (FP32_SPLIT3): fwd + bwd interpret kernels
    match the exact-fp32 XLA oracle to the bf16x3 error bound (~1e-5 rel;
    the default mode stays bit-tighter — see the FP32_SPLIT3 comment)."""
    import jax.numpy as jnp

    import gemnet_pytorch_tpu.ops.pallas.segment_outer as so

    a, b, ids, splits, E = _make_case(rng)
    ja, jb, jids, jsp = map(jnp.asarray, (a, b, ids, splits))
    ref = np.asarray(so._outer_sum_xla(ja, jb, jids, E))
    cot = rng.normal(size=ref.shape).astype(np.float32)
    da_ref, db_ref = map(np.asarray,
                         so._gather_contract_xla(jnp.asarray(cot), ja, jb, jids))
    so.set_fp32_split3(True)
    try:
        out = np.asarray(
            so._outer_sum_pallas(ja, jb, jids, jsp, E, interpret=True))
        da, db = map(np.asarray, so._gather_contract_pallas(
            jnp.asarray(cot), ja, jb, jids, jsp, interpret=True))
    finally:
        so.set_fp32_split3(False)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-5 * scale)
    np.testing.assert_allclose(da, da_ref, atol=3e-5 * np.abs(da_ref).max())
    np.testing.assert_allclose(db, db_ref, atol=3e-5 * np.abs(db_ref).max())
