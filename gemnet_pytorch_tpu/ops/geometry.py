"""Geometric primitives: distances, angles, dihedral projection.

Mirrors the math of the reference's static helpers
(gemnet/model/gemnet.py:261-451) with one TPU/JAX-specific addition: every
sqrt/division is where-guarded so that **padded** rows (masked graph slots)
produce finite values AND finite gradients. This matters because the
energy-gradient force path differentiates through all of these (double
backward during training), and on padded rows the raw expressions hit
sqrt(0)/0-division whose cotangents would be NaN and poison the whole
gradient via masked-but-connected graph edges.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_SQ = 1e-18  # guards |cross|^2; matches the reference's y >= 1e-9 clamp


def interatomic_vectors(
    R: jnp.ndarray, id_s: jnp.ndarray, id_t: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distances and unit directions s->t per edge (reference gemnet.py:262-286).

    Padded edges (mask False) get D=1, V=0 with zero gradient into R.
    """
    V = R[id_t] - R[id_s]  # (E, 3)
    m = mask[:, None]
    V = jnp.where(m, V, jnp.zeros_like(V))
    d2 = jnp.sum(V * V, axis=1)
    d2 = jnp.where(mask, d2, jnp.ones_like(d2))  # guarded: sqrt'(1) finite
    D = jnp.sqrt(d2)
    V = V / D[:, None]
    return D, V


def neighbor_angles(R_ac: jnp.ndarray, R_ab: jnp.ndarray) -> jnp.ndarray:
    """Angle between vector pairs via atan2(|u x v|, u.v)
    (reference gemnet.py:289-311, incl. the 1e-9 clamp on |u x v|)."""
    x = jnp.sum(R_ac * R_ab, axis=-1)
    cross = jnp.cross(R_ac, R_ab)
    # sqrt(max(|c|^2, eps^2)) == max(|c|, eps) but with a finite gradient at 0
    y = jnp.sqrt(jnp.maximum(jnp.sum(cross * cross, axis=-1), _EPS_SQ))
    return jnp.arctan2(y, x)


def vector_rejection(R_ab: jnp.ndarray, P_n: jnp.ndarray) -> jnp.ndarray:
    """Component of R_ab orthogonal to P_n (reference gemnet.py:313-332),
    with a guarded denominator for degenerate padded rows."""
    a_dot_n = jnp.sum(R_ab * P_n, axis=-1)
    n_dot_n = jnp.maximum(jnp.sum(P_n * P_n, axis=-1), _EPS_SQ)
    return R_ab - (a_dot_n / n_dot_n)[:, None] * P_n


def triplet_angles(
    R: jnp.ndarray,
    id_c: jnp.ndarray,
    id_a: jnp.ndarray,
    id3_reduce_ca: jnp.ndarray,
    id3_expand_ba: jnp.ndarray,
) -> jnp.ndarray:
    """Angles c<-a->b for triplet message passing (reference gemnet.py:420-451)."""
    Rc = R[id_c[id3_reduce_ca]]
    Ra = R[id_a[id3_reduce_ca]]
    Rb = R[id_c[id3_expand_ba]]
    return neighbor_angles(Rc - Ra, Rb - Ra)


def triplet_angles_halo(
    R: jnp.ndarray,
    id_c: jnp.ndarray,
    id_a: jnp.ndarray,
    id3_reduce_ca: jnp.ndarray,
    trip_b_atom: jnp.ndarray,
) -> jnp.ndarray:
    """Halo-mode triplet angles: the expand edge's source atom is precomputed
    per row by the host partitioner (parallel/halo.py) so no cross-shard edge
    lookup is needed; id3_reduce_ca holds LOCAL edge slots. Same math as
    `triplet_angles` (reference gemnet.py:420-451)."""
    Rc = R[id_c[id3_reduce_ca]]
    Ra = R[id_a[id3_reduce_ca]]
    Rb = R[trip_b_atom]
    return neighbor_angles(Rc - Ra, Rb - Ra)


def quadruplet_angles_halo(
    R: jnp.ndarray,
    id_c: jnp.ndarray,
    id_a: jnp.ndarray,
    id4_int_b: jnp.ndarray,
    id4_reduce_intm_ca: jnp.ndarray,
    id4_reduce_intm_ab: jnp.ndarray,
    id4_reduce_cab: jnp.ndarray,
    intm_ext_a_atom: jnp.ndarray,
    intm_ext_b_atom: jnp.ndarray,
    intm_ext_d_atom: jnp.ndarray,
    n_intm_db_local: int,
    id4_expand_abd: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Halo-mode quadruplet angles (same math as `quadruplet_angles`,
    reference gemnet.py:334-418) over partitioned spaces:

    - intm_ca rows are local (owned with their c->a edge;
      `id4_reduce_intm_ca` holds LOCAL edge slots);
    - the intm_db dihedral projection is computed on the EXTENDED
      [local ; halo] space directly from per-row ATOM indices (positions R
      are replicated, so halo-row geometry is locally computable and needs
      no runtime exchange);
    - angle_abd (feeding the circular basis) is returned for the local
      intm_db rows only.
    """
    # c -> a <- b on local intm_ca rows (bundled gather: see
    # quadruplet_angles — per-row gather/scatter cost is width-independent)
    Rc = R[id_c[id4_reduce_intm_ca]]
    Ra = R[id_a[id4_reduce_intm_ca]]
    Rb = R[id4_int_b[id4_reduce_intm_ab]]
    R_ac = Rc - Ra
    R_ab = Rb - Ra
    packed = jnp.concatenate(
        [neighbor_angles(R_ab, R_ac)[:, None], vector_rejection(R_ac, R_ab)],
        axis=1,
    )[id4_reduce_cab]  # -> quad space
    angle_cab = packed[:, 0]
    R_ac_proj = packed[:, 1:]

    # a - b <- d on the EXTENDED intm_db space
    Ra = R[intm_ext_a_atom]
    Rb = R[intm_ext_b_atom]
    Rd = R[intm_ext_d_atom]
    R_ba = Ra - Rb
    R_bd = Rd - Rb
    angle_abd = neighbor_angles(R_ba, R_bd)[:n_intm_db_local]
    R_bd_proj = vector_rejection(R_bd, R_ba)[id4_expand_abd]  # -> quad space

    angle_cabd = neighbor_angles(R_ac_proj, R_bd_proj)
    return angle_cab, angle_abd, angle_cabd


def _sorted_gather(x, idx, sort, implementation="auto"):
    """x[idx], via the sorted-VJP expand gather when sort=(perm, sorted_ids)
    metadata is available (ops/pallas/expand_gather.py)."""
    if sort is None:
        return x[idx]
    from .pallas.expand_gather import expand_gather

    return expand_gather(x, idx, sort[0], sort[1], x.shape[0], implementation)


def quadruplet_angles(
    R: jnp.ndarray,
    id_c: jnp.ndarray,
    id_a: jnp.ndarray,
    id4_int_b: jnp.ndarray,
    id4_int_a: jnp.ndarray,
    id4_expand_abd: jnp.ndarray,
    id4_reduce_cab: jnp.ndarray,
    id4_expand_intm_db: jnp.ndarray,
    id4_reduce_intm_ca: jnp.ndarray,
    id4_expand_intm_ab: jnp.ndarray,
    id4_reduce_intm_ab: jnp.ndarray,
    abd_sort=None,
    cab_sort=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(angle_cab, angle_abd, angle_cabd) for quadruplet message passing
    (reference gemnet.py:334-418). angle_abd lives on the intermediate-db
    space; the other two on the quadruplet space."""
    # a - b <- d (intermediate db space)
    Ra = R[id4_int_a[id4_expand_intm_ab]]
    Rb = R[id4_int_b[id4_expand_intm_ab]]
    Rd = R[id_c[id4_expand_intm_db]]
    R_ba = Ra - Rb
    R_bd = Rd - Rb
    angle_abd = neighbor_angles(R_ba, R_bd)
    R_bd_proj = _sorted_gather(
        vector_rejection(R_bd, R_ba), id4_expand_abd, abd_sort
    )  # -> quad space

    # c -> a <- b (intermediate ca space)
    Rc = R[id_c[id4_reduce_intm_ca]]
    Ra = R[id_a[id4_reduce_intm_ca]]
    Rb = R[id4_int_b[id4_reduce_intm_ab]]
    R_ac = Rc - Ra
    R_ab = Rb - Ra
    # one (n_intm, 4) gather for [angle_cab ; R_ac_proj] instead of separate
    # (n,) and (n, 3) gathers with the same index: TPU gather/scatter cost is
    # per-ROW, width-independent, and the 1-wide variants are the slowest of
    # all (~1.4-1.7 ms each at bench quad shapes, scripts/scatter_probe.py);
    # the VJP collapses two quad->intm scatter-adds into one the same way
    packed = _sorted_gather(
        jnp.concatenate(
            [neighbor_angles(R_ab, R_ac)[:, None],
             vector_rejection(R_ac, R_ab)], axis=1,
        ),
        id4_reduce_cab, cab_sort,
    )  # -> quad space
    angle_cab = packed[:, 0]
    R_ac_proj = packed[:, 1:]

    # dihedral c -> a - b <- d
    angle_cabd = neighbor_angles(R_ac_proj, R_bd_proj)
    return angle_cab, angle_abd, angle_cabd
