"""Native C++ graph builder vs the numpy builder: exact array parity
(including within-group CSR ordering) and invariants."""

import numpy as np
import pytest

from gemnet_pytorch_tpu.data.graph import build_graph, check_invariants
from gemnet_pytorch_tpu.data.native import native_available
from gemnet_pytorch_tpu.data.synthetic import random_molecule

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native builder unavailable (no g++)"
)


def _batch(seed, n_mol=6, lo=4, hi=11):
    rng = np.random.default_rng(seed)
    mols = [random_molecule(rng, int(rng.integers(lo, hi))) for _ in range(n_mol)]
    N = np.array([len(z) for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    return R, N


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("triplets_only", [True, False])
def test_native_matches_numpy(seed, triplets_only):
    R, N = _batch(seed)
    g_np = build_graph(R, N, 5.0, 10.0, triplets_only=triplets_only, backend="numpy")
    g_nat = build_graph(R, N, 5.0, 10.0, triplets_only=triplets_only, backend="native")
    check_invariants(g_nat)

    np.testing.assert_array_equal(g_nat.id_c, g_np.id_c)
    np.testing.assert_array_equal(g_nat.id_a, g_np.id_a)
    np.testing.assert_array_equal(g_nat.id_swap, g_np.id_swap)
    # triplets: same (reduce, expand) sets; native is reduce-major + CSR order
    def pairs(*cols):
        a = np.stack([np.asarray(c, np.int64) for c in cols], 1)
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_array_equal(
        pairs(g_nat.id3_reduce_ca, g_nat.id3_expand_ba),
        pairs(g_np.id3_reduce_ca, g_np.id3_expand_ba),
    )
    assert np.all(np.diff(g_nat.id3_reduce_ca) >= 0)
    if triplets_only:
        return
    np.testing.assert_array_equal(g_nat.id4_int_a, g_np.id4_int_a)
    np.testing.assert_array_equal(g_nat.id4_int_b, g_np.id4_int_b)
    np.testing.assert_array_equal(g_nat.id4_reduce_intm_ca, g_np.id4_reduce_intm_ca)
    np.testing.assert_array_equal(g_nat.id4_expand_intm_db, g_np.id4_expand_intm_db)
    np.testing.assert_array_equal(g_nat.id4_reduce_intm_ab, g_np.id4_reduce_intm_ab)
    np.testing.assert_array_equal(g_nat.id4_expand_intm_ab, g_np.id4_expand_intm_ab)
    np.testing.assert_array_equal(
        pairs(g_nat.id4_reduce_ca, g_nat.id4_expand_db,
              g_nat.id4_reduce_cab, g_nat.id4_expand_abd),
        pairs(g_np.id4_reduce_ca, g_np.id4_expand_db,
              g_np.id4_reduce_cab, g_np.id4_expand_abd),
    )
    assert np.all(np.diff(g_nat.id4_reduce_ca) >= 0)


def test_native_empty_and_single():
    # single atom: no edges
    g = build_graph(np.zeros((1, 3), np.float32), np.array([1]), 5.0, 10.0,
                    backend="native")
    assert g.n_edges == 0 and g.n_triplets == 0 and g.n_quads == 0
    # two atoms in range: one undirected pair, no triplets
    R = np.array([[0, 0, 0], [1.2, 0, 0]], np.float32)
    g = build_graph(R, np.array([2]), 5.0, 10.0, backend="native")
    assert g.n_edges == 2 and g.n_triplets == 0
