"""expand_gather (ops/pallas/expand_gather.py): the sorted-VJP gather must
match plain x[idx] in value AND in first/second derivatives (the force path
differentiates through it twice), on the XLA fallback and the Pallas
(interpret-mode) segsum kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemnet_pytorch_tpu.ops.pallas import expand_gather as eg


def _case(n_src=1024, n_rows=4096, M=32, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_src - 1, n_rows).astype(np.int32)
    perm = np.argsort(idx, kind="stable").astype(np.int32)
    sorted_ids = idx[perm]
    table = rng.standard_normal((n_src, M)).astype(np.float32)
    cot = rng.standard_normal((n_rows, M)).astype(np.float32)
    return (jnp.asarray(table), jnp.asarray(idx), jnp.asarray(perm),
            jnp.asarray(sorted_ids), jnp.asarray(cot))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_forward_and_vjp_match_plain_gather(impl, monkeypatch):
    table, idx, perm, sorted_ids, cot = _case()
    if impl == "pallas":
        orig = eg._segsum_pallas
        monkeypatch.setattr(
            eg, "_segsum_pallas",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        monkeypatch.setattr(eg, "_use_pallas", lambda _: True)
    else:
        monkeypatch.setattr(eg, "_use_pallas", lambda _: False)

    out = eg.expand_gather(table, idx, perm, sorted_ids, table.shape[0], impl)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))

    # first derivative: VJP of sum(out * cot) wrt table == scatter-add
    def f(t):
        return jnp.sum(
            eg.expand_gather(t, idx, perm, sorted_ids, t.shape[0], impl) * cot
        )

    def f_ref(t):
        return jnp.sum(t[idx] * cot)

    g = jax.grad(f)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-6, atol=2e-6)

    # second derivative (grad-of-grad, the -dE/dR double-backward pattern)
    def gg(t):
        return jnp.sum(jax.grad(f)(t) ** 2)

    def gg_ref(t):
        return jnp.sum(jax.grad(f_ref)(t) ** 2)

    h = jax.grad(gg)(table)
    h_ref = jax.grad(gg_ref)(table)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=3e-5, atol=3e-5)


def test_segsum_kernel_matches_xla(monkeypatch):
    table, idx, perm, sorted_ids, cot = _case(n_src=1536, n_rows=8192, M=24)
    ref = np.zeros((1536, 24), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(cot))
    out = eg._segsum_pallas(
        jnp.asarray(cot)[perm], sorted_ids, 1536, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_padded_rows_match_scatter_semantics():
    """Padded rows (idx pinned to a safe slot) contribute the same terms the
    scatter path adds — the two paths stay interchangeable."""
    table, idx, perm, sorted_ids, cot = _case(n_src=512, n_rows=2048, M=8)
    idx = idx.at[-100:].set(511)  # padded tail
    perm = jnp.asarray(np.argsort(np.asarray(idx), kind="stable").astype(np.int32))
    sorted_ids = idx[perm]

    def f(t):
        return jnp.sum(
            eg.expand_gather(t, idx, perm, sorted_ids, 512, "xla") * cot)

    g = jax.grad(f)(table)
    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * cot))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-6, atol=2e-6)


def test_model_uses_sorted_gather_when_metadata_present(synthetic_npz):
    """pad_batch emits the sort metadata and the model consumes it: the full
    energy+forces agree with a run where the metadata is stripped (plain
    gather path)."""
    from __graft_entry__ import _make_graphs, _pad, _shared_dims, _small_cfg
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg = _small_cfg(triplets_only=False, direct_forces=False)
    model = make_model(cfg)
    tup = _make_graphs(cfg, n_molecules=2, seed=5, max_atoms=7)
    batch_np = _pad(cfg, tup, _shared_dims(cfg, [tup]))
    assert "quad_abd_perm" in batch_np and "quad_cab_perm" in batch_np
    assert "trip_ba_perm" in batch_np and "intm_db_perm" in batch_np
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    E1, F1, _ = energy_and_forces(model, variables, batch)
    stripped = {k: v for k, v in batch.items()
                if not (k.startswith(("quad_abd_", "quad_cab_", "trip_ba_"))
                        or k in ("intm_db_perm", "intm_db_sorted"))}
    E2, F2, _ = energy_and_forces(model, variables, stripped)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=2e-6)
    # gradients too (the sorted-VJP path is the point of the metadata)
    def loss(v, b):
        E, F, _ = energy_and_forces(model, v, b)
        return jnp.sum(jnp.abs(E)) + jnp.sum(jnp.abs(F))

    g1 = jax.grad(loss)(variables, batch)["params"]
    g2 = jax.grad(loss)(variables, stripped)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6),
        g1, g2)


def test_huge_rowspace_scatter_branch(monkeypatch):
    """The size-dispatched scatter path (round 5: row spaces > 32 MB skip
    the permute) — driven by shrinking the threshold to 0 so the branch
    runs at test sizes, incl. the double backward."""
    monkeypatch.setattr(eg, "_PERMUTE_MAX_BYTES", 0)
    table, idx, perm, sorted_ids, cot = _case(n_src=512, n_rows=2048, M=8)
    tb = table.astype(jnp.bfloat16)
    cb = cot.astype(jnp.bfloat16)

    def f(t):
        return jnp.sum(
            (eg.expand_gather(t, idx, perm, sorted_ids, 512, "xla")
             * cb).astype(jnp.float32))

    def f_ref(t):
        return jnp.sum((t[idx] * cb).astype(jnp.float32))

    g = jax.grad(f)(tb)
    g_ref = jax.grad(f_ref)(tb)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    # second order (the force path's double backward)
    h = jax.grad(lambda t: jnp.sum(jax.grad(f)(t).astype(jnp.float32) ** 2))(tb)
    assert np.isfinite(np.asarray(h, np.float32)).all()
