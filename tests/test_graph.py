"""Graph/index-builder tests: vectorized kernels, invariants (the reference's
commented-out asserts at data_container.py:341-344,393-405 as real tests), and
golden comparison against the reference DataContainer run via shims."""

import numpy as np
import pytest

from conftest import add_reference_shims
from gemnet_pytorch_tpu.data.graph import (
    build_graph,
    check_invariants,
    ragged_range,
    repeat_blocks,
)
from gemnet_pytorch_tpu.data.synthetic import random_molecule


def test_repeat_blocks_examples():
    # examples documented at reference data_container.py:526-533
    assert repeat_blocks(np.array([1, 3, 2]), np.array([3, 2, 3])).tolist() == [
        0, 0, 0, 1, 2, 3, 1, 2, 3, 4, 5, 4, 5, 4, 5]
    assert repeat_blocks(np.array([0, 3, 2]), np.array([3, 2, 3])).tolist() == [
        0, 1, 2, 0, 1, 2, 3, 4, 3, 4, 3, 4]
    assert repeat_blocks(np.array([2, 3, 2]), np.array([2, 0, 2])).tolist() == [
        0, 1, 0, 1, 5, 6, 5, 6]


def test_ragged_range_example():
    assert ragged_range(np.array([1, 3, 2])).tolist() == [0, 0, 1, 2, 0, 1]
    assert ragged_range(np.array([], dtype=np.int64)).tolist() == []


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("triplets_only", [True, False])
def test_invariants_random_batches(seed, triplets_only):
    rng = np.random.default_rng(seed)
    mols = [random_molecule(rng, int(rng.integers(3, 10))) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only)
    assert g.n_edges > 0 and g.n_triplets > 0
    if not triplets_only:
        assert g.n_quads > 0
    check_invariants(g)


def _sorted_pairs(*cols):
    a = np.stack([np.asarray(c, dtype=np.int64) for c in cols], axis=1)
    order = np.lexsort(a.T[::-1])
    return a[order]


@pytest.mark.parametrize("triplets_only", [True, False])
def test_matches_reference_builder(synthetic_npz, triplets_only):
    add_reference_shims()
    from gemnet.training.data_container import DataContainer as RefContainer

    ref = RefContainer(
        synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only
    )
    idx = [0, 1, 2, 3, 4, 5]
    ref_batch = {k: v.numpy() for k, v in ref[idx].items()}

    import gemnet_pytorch_tpu.data.containers as C

    mine = C.DataContainer(
        synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=triplets_only
    )
    g, Z, R, E, F = mine.build(idx)

    # scalars / atoms
    np.testing.assert_array_equal(g.batch_seg, ref_batch["batch_seg"])
    np.testing.assert_array_equal(Z, ref_batch["Z"])
    np.testing.assert_allclose(R, ref_batch["R"], rtol=0, atol=0)
    # edges: canonical order must match exactly
    np.testing.assert_array_equal(g.id_c, ref_batch["id_c"])
    np.testing.assert_array_equal(g.id_a, ref_batch["id_a"])
    np.testing.assert_array_equal(g.id_undir, ref_batch["id_undir"])
    np.testing.assert_array_equal(g.id_swap, ref_batch["id_swap"])
    # triplets: equal as sets of (reduce, expand) pairs (sort tie-break differs)
    np.testing.assert_array_equal(
        _sorted_pairs(g.id3_reduce_ca, g.id3_expand_ba),
        _sorted_pairs(ref_batch["id3_reduce_ca"], ref_batch["id3_expand_ba"]),
    )
    # Kidx3 must enumerate each reduce group 0..K-1
    counts = np.bincount(g.id3_reduce_ca, minlength=g.n_edges)
    for e in range(g.n_edges):
        k = np.sort(g.Kidx3[g.id3_reduce_ca == e])
        assert k.tolist() == list(range(counts[e]))

    if triplets_only:
        return

    np.testing.assert_array_equal(g.id4_int_a, ref_batch["id4_int_a"])
    np.testing.assert_array_equal(g.id4_int_b, ref_batch["id4_int_b"])
    np.testing.assert_array_equal(
        g.id4_reduce_intm_ca, ref_batch["id4_reduce_intm_ca"]
    )
    np.testing.assert_array_equal(
        g.id4_expand_intm_db, ref_batch["id4_expand_intm_db"]
    )
    np.testing.assert_array_equal(
        g.id4_reduce_intm_ab, ref_batch["id4_reduce_intm_ab"]
    )
    np.testing.assert_array_equal(
        g.id4_expand_intm_ab, ref_batch["id4_expand_intm_ab"]
    )
    # quadruplets as sets of full tuples
    np.testing.assert_array_equal(
        _sorted_pairs(
            g.id4_reduce_ca, g.id4_expand_db, g.id4_reduce_cab, g.id4_expand_abd
        ),
        _sorted_pairs(
            ref_batch["id4_reduce_ca"],
            ref_batch["id4_expand_db"],
            ref_batch["id4_reduce_cab"],
            ref_batch["id4_expand_abd"],
        ),
    )
    check_invariants(g)
