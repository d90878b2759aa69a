"""Basis-function golden tests: the numeric coefficient-recurrence
implementation must match the reference's sympy formula generation
(reference basis_utils.py) and the reference basis layers run in torch."""

import numpy as np
import pytest
import sympy as sym

from conftest import add_reference_shims
from gemnet_pytorch_tpu.models.basis import (
    CircularBasis,
    Envelope,
    RadialBasis,
    SphericalBasis,
    bessel_normalizers,
    bessel_zeros,
    spherical_bessel_sincos_coeffs,
)

S, R = 7, 6


@pytest.fixture(scope="module")
def ref_formulas():
    add_reference_shims()
    from gemnet.model.layers.basis_utils import bessel_basis, real_sph_harm

    return bessel_basis(S, R), real_sph_harm(S, spherical_coordinates=True, zero_m_only=False)


def test_bessel_zeros_match_scipy():
    from scipy import special

    z = bessel_zeros(S, R)
    for l in range(S):
        np.testing.assert_allclose(special.spherical_jn(l, z[l]), 0, atol=1e-9)


def test_spherical_bessel_coeff_form():
    """sin/cos coefficient form equals scipy's j_l on a grid."""
    from scipy import special

    a, b = spherical_bessel_sincos_coeffs(S)
    x = np.linspace(0.3, 40, 500)
    for l in range(S):
        inv = 1 / x
        pa = sum(c * inv ** (k + 1) for k, c in enumerate(a[l]))
        pb = sum(c * inv ** (k + 1) for k, c in enumerate(b[l]))
        val = np.sin(x) * pa + np.cos(x) * pb
        # atol covers the catastrophic cancellation of the sin/cos form at
        # small x (the reference's sympy-simplified form has it too)
        np.testing.assert_allclose(val, special.spherical_jn(l, x), atol=5e-8)


def test_normalized_bessel_vs_sympy(ref_formulas):
    bessel_formulas, _ = ref_formulas
    x_sym = sym.symbols("x")
    d = np.linspace(0.05, 0.999, 50)
    zeros = bessel_zeros(S, R)
    norms = bessel_normalizers(S, R)
    a, b = spherical_bessel_sincos_coeffs(S)
    for l in range(S):
        for n in range(R):
            f = sym.lambdify([x_sym], bessel_formulas[l][n], "numpy")
            ref = f(d)
            arg = zeros[l][n] * d
            inv = 1 / arg
            pa = sum(c * inv ** (k + 1) for k, c in enumerate(a[l]))
            pb = sum(c * inv ** (k + 1) for k, c in enumerate(b[l]))
            mine = norms[l][n] * (np.sin(arg) * pa + np.cos(arg) * pb)
            # rtol: the reference rounds Bessel zeros/normalizers to float32
            # (basis_utils.py:18-28); ours stay float64
            np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-6)


def test_real_sph_harm_vs_sympy(ref_formulas):
    _, Y_lm = ref_formulas
    theta_s, phi_s = sym.symbols("theta"), sym.symbols("phi")
    rng = np.random.default_rng(0)
    alpha = rng.uniform(0.01, np.pi - 0.01, size=64)
    theta = rng.uniform(-np.pi, np.pi, size=64)
    basis = SphericalBasis(S, R, cutoff=5.0)
    mine = np.asarray(basis.sbf(alpha, theta))
    col = 0
    for l in range(S):
        for j in range(2 * l + 1):
            expr = Y_lm[l][j]
            f = sym.lambdify([theta_s, phi_s], expr, "numpy")
            ref = np.broadcast_to(np.asarray(f(alpha, theta), dtype=np.float64), alpha.shape)
            np.testing.assert_allclose(
                mine[:, col], ref, rtol=1e-5, atol=1e-6,
                err_msg=f"l={l} j={j}",
            )
            col += 1


def test_circular_basis_Y_l0_vs_sympy(ref_formulas):
    _, Y_lm = ref_formulas
    theta_s = sym.symbols("theta")
    angle = np.linspace(0.01, np.pi - 0.01, 77)
    cb = CircularBasis(S, R, cutoff=5.0)
    mine = np.asarray(cb.cbf(angle))
    for l in range(S):
        f = sym.lambdify([theta_s], Y_lm[l][0], "numpy")
        ref = np.broadcast_to(np.asarray(f(angle), dtype=np.float64), angle.shape)
        np.testing.assert_allclose(mine[:, l], ref, rtol=1e-5, atol=1e-6)


def test_envelope_vs_reference_layer():
    add_reference_shims()
    import torch

    from gemnet.model.layers.envelope import Envelope as RefEnvelope

    d = np.linspace(0, 1.5, 100).astype(np.float32)
    for p in (5, 6):
        ref = RefEnvelope(p)(torch.tensor(d)).numpy()
        mine = np.asarray(Envelope(p)(d))
        # atol: torch vs XLA fp32 pow rounding (~5e-7)
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=5e-6)


def test_radial_basis_vs_reference_layer():
    add_reference_shims()
    import torch

    from gemnet.model.layers.basis_layers import BesselBasisLayer

    ref_layer = BesselBasisLayer(R, cutoff=5.0, envelope_exponent=5)
    d = np.random.default_rng(1).uniform(0.8, 6.0, size=64).astype(np.float32)
    ref = ref_layer(torch.tensor(d)).detach().numpy()
    rb = RadialBasis(R, cutoff=5.0, envelope_exponent=5)
    mine = np.asarray(rb(rb.init_frequencies(), d))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def test_rbf_env_vs_reference_spherical_layer():
    """Radial+envelope part of the 2D basis vs reference SphericalBasisLayer
    (efficient mode returns (rbf_env, sph2))."""
    add_reference_shims()
    import torch

    from gemnet.model.layers.basis_layers import SphericalBasisLayer

    ref_layer = SphericalBasisLayer(S, R, cutoff=5.0, envelope_exponent=5, efficient=True)
    rng = np.random.default_rng(2)
    d = rng.uniform(0.8, 6.0, size=32).astype(np.float32)
    ang = rng.uniform(0.05, np.pi - 0.05, size=10).astype(np.float32)
    id3 = np.sort(rng.integers(0, 32, size=10)).astype(np.int64)
    # Kidx: position within each reduce group
    Kidx = np.zeros(10, dtype=np.int64)
    for e in np.unique(id3):
        sel = np.nonzero(id3 == e)[0]
        Kidx[sel] = np.arange(len(sel))
    rbf_env_ref, sph2_ref = ref_layer(
        torch.tensor(d), torch.tensor(ang), torch.tensor(id3), torch.tensor(Kidx)
    )
    rbf_env_ref = rbf_env_ref.detach().numpy()  # (S, E, R)
    cb = CircularBasis(S, R, cutoff=5.0, envelope_exponent=5)
    mine_env = np.asarray(cb.rbf_env(d, np.ones(32, bool)))  # (E, S, R)
    np.testing.assert_allclose(
        # atol: fp32 Bessel zeros + torch-vs-XLA pow rounding compound near the
        # envelope cutoff
        np.transpose(mine_env, (1, 0, 2)), rbf_env_ref, rtol=2e-3, atol=1e-5
    )
    mine_sph = np.asarray(cb.cbf(ang))
    # scatter into the ref layout and compare
    sph2 = np.zeros_like(sph2_ref.detach().numpy())
    sph2[id3, Kidx] = mine_sph
    np.testing.assert_allclose(sph2, sph2_ref.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_rbf_env3_vs_reference_tensor_layer():
    add_reference_shims()
    import torch

    from gemnet.model.layers.basis_layers import TensorBasisLayer

    ref_layer = TensorBasisLayer(S, R, cutoff=5.0, envelope_exponent=5, efficient=True)
    rng = np.random.default_rng(3)
    d = rng.uniform(0.8, 6.0, size=16).astype(np.float32)
    alpha = rng.uniform(0.05, np.pi - 0.05, size=8).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, size=8).astype(np.float32)
    id4 = np.sort(rng.integers(0, 16, size=8)).astype(np.int64)
    Kidx = np.zeros(8, dtype=np.int64)
    for e in np.unique(id4):
        sel = np.nonzero(id4 == e)[0]
        Kidx[sel] = np.arange(len(sel))
    env_ref, sph2_ref = ref_layer(
        torch.tensor(d), torch.tensor(alpha), torch.tensor(theta),
        torch.tensor(id4), torch.tensor(Kidx),
    )
    sb = SphericalBasis(S, R, cutoff=5.0, envelope_exponent=5)
    mine_env = np.asarray(sb.rbf_env3(d, np.ones(16, bool)))  # (E, S^2, R)
    np.testing.assert_allclose(
        np.transpose(mine_env, (1, 0, 2)), env_ref.detach().numpy(), rtol=2e-3, atol=1e-5
    )
    mine_sph = np.asarray(sb.sbf(alpha, theta))
    sph2 = np.zeros_like(sph2_ref.detach().numpy())
    sph2[id4, Kidx] = mine_sph
    np.testing.assert_allclose(sph2, sph2_ref.detach().numpy(), rtol=1e-4, atol=1e-5)
