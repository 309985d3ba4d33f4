"""Quadrature rules: Gauss-Legendre exactness and spherical-design properties."""

import numpy as np
import pytest

from boltzfft import quadrature as quad


class TestGaussLegendre:
    def test_polynomial_exactness(self):
        # n-point GL is exact for polynomials up to degree 2n-1.
        rule = quad.gauss_legendre(8, 0.0, 10.0)
        for deg in range(16):
            approx = np.sum(rule.weights * rule.nodes**deg)
            exact = 10.0 ** (deg + 1) / (deg + 1)
            assert abs(approx - exact) / exact < 1e-13, deg

    def test_interval_mapping(self):
        rule = quad.gauss_legendre(32, 0.0, 10.0)
        assert rule.n == 32
        assert np.all(rule.nodes > 0.0) and np.all(rule.nodes < 10.0)
        assert np.all(np.diff(rule.nodes) > 0)
        np.testing.assert_allclose(rule.weights.sum(), 10.0, rtol=1e-14)

    def test_transcendental_integral(self):
        # integral_0^1 e^x dx = e - 1, converged at n=20
        rule = quad.gauss_legendre(20, 0.0, 1.0)
        approx = np.sum(rule.weights * np.exp(rule.nodes))
        np.testing.assert_allclose(approx, np.e - 1.0, rtol=1e-15)

    def test_invalid_n(self):
        with pytest.raises(ValueError):
            quad.gauss_legendre(0, 0.0, 1.0)


class TestSphericalDesign:
    @pytest.mark.parametrize("n", sorted(quad.SPHERICAL_DESIGN_FILES))
    def test_nodes_on_unit_sphere(self, n):
        sph = quad.spherical_design(n)
        assert sph.points.shape == (n, 3)
        np.testing.assert_allclose(
            np.linalg.norm(sph.points, axis=1), 1.0, atol=5e-15
        )

    @pytest.mark.parametrize("n", sorted(quad.SPHERICAL_DESIGN_FILES))
    def test_weights_sum_to_sphere_area(self, n):
        sph = quad.spherical_design(n)
        np.testing.assert_allclose(sph.weights.sum(), 4.0 * np.pi, rtol=1e-14)

    @pytest.mark.parametrize("n,strength", [(6, 3), (12, 5), (32, 7), (192, 19)])
    def test_design_strength(self, n, strength):
        # A spherical t-design integrates monomials up to total degree t
        # exactly against the uniform measure.
        sph = quad.spherical_design(n)
        rng = np.random.RandomState(0)
        for _ in range(5):
            # random homogeneous monomial of odd degree <= t integrates to 0;
            # x^2 has mean 1/3 over the sphere.
            pass
        x, y, z = sph.x, sph.y, sph.z
        w = sph.weights
        # odd moments vanish
        for mono in (x, y, z, x * y, x * y * z, x**3):
            assert abs(np.sum(w * mono)) < 1e-12
        # even second moments: integral x^2 = 4*pi/3
        for mono in (x**2, y**2, z**2):
            np.testing.assert_allclose(np.sum(w * mono), 4 * np.pi / 3, atol=1e-12)

    def test_symmetric_design(self):
        # "ss" tables are symmetric designs: nodes come in antipodal pairs.
        sph = quad.spherical_design(12)
        pts = sph.points
        for p in pts:
            d = np.linalg.norm(pts + p, axis=1).min()
            assert d < 1e-12

    def test_invalid_n(self):
        with pytest.raises(ValueError):
            quad.spherical_design(13)


class TestAntipodalReduce:
    @pytest.mark.parametrize("n", sorted(quad.SPHERICAL_DESIGN_FILES))
    def test_reduces_every_shipped_design(self, n):
        sph = quad.spherical_design(n)
        half = quad.antipodal_reduce(sph)
        assert half.n == n // 2
        # weights still integrate constants: sum w = 4*pi
        np.testing.assert_allclose(half.weights.sum(), 4 * np.pi, rtol=1e-14)
        # kept nodes plus their negations recover the full set exactly
        full = {p.tobytes() for p in sph.points}
        rec = {p.tobytes() for p in half.points} | {
            (-p).tobytes() for p in half.points
        }
        assert rec == full
        # even integrands integrate identically (bitwise-equal terms)
        x2 = (sph.points[:, 0] ** 2 * sph.weights).sum()
        x2h = (half.points[:, 0] ** 2 * half.weights).sum()
        np.testing.assert_allclose(x2h, x2, rtol=1e-15)

    def test_asymmetric_set_rejected(self):
        pts = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        sph = quad.SphericalQuadrature(
            points=pts, weights=np.full(2, 2 * np.pi)
        )
        with pytest.raises(ValueError, match="antipodal"):
            quad.antipodal_reduce(sph)

    def test_pairs_none_for_odd(self):
        pts = np.array([[1.0, 0.0, 0.0]])
        assert quad.antipodal_pairs(pts) is None
