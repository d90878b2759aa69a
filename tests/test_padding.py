"""Static padding layer: masked slots must preserve all canonical index
relationships after the edge-id remap into the padded two-half layout."""

import numpy as np

from gemnet_pytorch_tpu.data.containers import DataContainer
from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch
from gemnet_pytorch_tpu.data.graph import build_graph
from gemnet_pytorch_tpu.data.synthetic import random_molecule


def _build(synthetic_npz, triplets_only):
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only)
    idx = list(range(6))
    g, Z, R, E, F = c.build(idx)
    dims = PadDims(
        n_mol=8,
        n_atoms=96,
        n_edges=2 * (g.n_edges // 2 + 32),
        n_triplets=g.n_triplets + 100,
        kmax3=g.kmax3 + 3,
        n_int_edges=0 if triplets_only else g.n_int_edges + 16,
        n_intm=0 if triplets_only else g.n_intm + 50,
        n_quads=0 if triplets_only else g.n_quads + 200,
        kmax4=0 if triplets_only else g.kmax4 + 3,
    )
    b = pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=triplets_only)
    return g, b, dims


def test_padded_edges_roundtrip(synthetic_npz):
    g, b, dims = _build(synthetic_npz, triplets_only=True)
    nE = g.n_edges
    em = b["edge_mask"]
    assert em.sum() == nE
    # real edges contiguous, canonical order preserved
    np.testing.assert_array_equal(b["id_c"][:nE], g.id_c)
    np.testing.assert_array_equal(b["id_a"][:nE], g.id_a)
    # swap reverses edges on real slots; padded slots map to themselves
    sw = b["id_swap"]
    np.testing.assert_array_equal(b["id_c"][sw][em], b["id_a"][em])
    np.testing.assert_array_equal(b["id_undir"][:nE], b["id_undir"][sw][:nE])
    np.testing.assert_array_equal(sw[nE:], np.arange(nE, dims.n_edges))
    # masks align between swapped pairs
    np.testing.assert_array_equal(em, em[sw])


def test_row_splits_cover_sorted_triplets(synthetic_npz):
    from gemnet_pytorch_tpu.data.padding import EDGE_BLOCK

    g, b, dims = _build(synthetic_npz, triplets_only=True)
    ids = b["id3_reduce_ca"]
    assert np.all(np.diff(ids) >= 0), "padded reduce ids must stay sorted"
    splits = b["trip_row_splits"]
    assert len(splits) == -(-dims.n_edges // EDGE_BLOCK) + 1
    for blk in range(len(splits) - 1):
        lo, hi = splits[blk], splits[blk + 1]
        if hi > lo:
            seg = ids[lo:hi]
            assert seg.min() >= blk * EDGE_BLOCK
            assert seg.max() < (blk + 1) * EDGE_BLOCK


def test_padded_triplets_consistent(synthetic_npz):
    g, b, dims = _build(synthetic_npz, triplets_only=True)
    tm = b["trip_mask"]
    assert tm.sum() == g.n_triplets
    # both triplet edges share the target atom (invariant survives remap)
    ia = b["id_a"]
    np.testing.assert_array_equal(
        ia[b["id3_expand_ba"]][tm], ia[b["id3_reduce_ca"]][tm]
    )
    # Kidx3 within bounds
    assert b["Kidx3"].max() < dims.kmax3


def test_padded_quads_consistent(synthetic_npz):
    g, b, dims = _build(synthetic_npz, triplets_only=False)
    qm = b["quad_mask"]
    assert qm.sum() == g.n_quads
    ic, ia = b["id_c"], b["id_a"]
    # c of quad = source of reduce edge = source of intm-gathered reduce edge
    lhs = ic[b["id4_reduce_ca"]][qm]
    rhs = ic[b["id4_reduce_intm_ca"][b["id4_reduce_cab"]]][qm]
    np.testing.assert_array_equal(lhs, rhs)
    # b of quad via the two intermediate routes agree
    intb = b["id4_int_b"]
    r1 = intb[b["id4_reduce_intm_ab"][b["id4_reduce_cab"]]][qm]
    r2 = intb[b["id4_expand_intm_ab"][b["id4_expand_abd"]]][qm]
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(r1, ia[b["id4_expand_db"]][qm])
    assert b["Kidx4"].max() < dims.kmax4


def test_pad_dims_grow(synthetic_npz):
    rng = np.random.default_rng(3)
    Z, R = random_molecule(rng, 20)
    g = build_graph(R, np.array([20]), 5.0, 10.0)
    small = PadDims(n_mol=1, n_atoms=8, n_edges=4, n_triplets=4, kmax3=1,
                    n_int_edges=2, n_intm=2, n_quads=2, kmax4=1)
    grown = small.grow_to(g, 1, 20)
    assert grown.fits(g, 1, 20)
