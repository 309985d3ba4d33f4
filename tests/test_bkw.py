"""BKW analytic solution: normalization, moments, and time-derivative checks."""

import numpy as np

from boltzfft import CollisionConfig, VelocityGrid, bkw_dfdt, bkw_f, bkw_k, maxwellian, moments


def _grid(nv=32):
    return CollisionConfig(nv=nv).velocity_grid


class TestBKW:
    def test_k(self):
        assert bkw_k(0.0) == 0.0
        np.testing.assert_allclose(bkw_k(6.5), 1.0 - np.exp(-6.5 / 6.0))

    def test_mass_momentum_energy(self):
        # BKW is a unit-mass, zero-drift, unit-temperature distribution.
        g = _grid(48)
        f = bkw_f(g.r_squared(), 6.5)
        m = moments(np.asarray(f), np.asarray(g.v), g.dv)
        np.testing.assert_allclose(float(m.mass), 1.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(m.momentum), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(m.energy), 1.5, atol=1e-9)
        np.testing.assert_allclose(float(m.temperature), 1.0, atol=1e-9)

    def test_dfdt_finite_difference(self):
        # Analytic df/dt must match a centered difference of f in t.
        g = _grid(32)
        rsq = g.r_squared()
        t, dt = 6.5, 1e-5
        fd = (bkw_f(rsq, t + dt) - bkw_f(rsq, t - dt)) / (2 * dt)
        np.testing.assert_allclose(bkw_dfdt(rsq, t), fd, atol=1e-9)

    def test_dfdt_conserves_invariants(self):
        # d/dt of mass, momentum, energy along BKW is 0.
        g = _grid(48)
        q = bkw_dfdt(g.r_squared(), 6.5)
        m = moments(np.asarray(q), np.asarray(g.v), g.dv)
        np.testing.assert_allclose(float(m.mass), 0.0, atol=1e-10)
        np.testing.assert_allclose(float(m.energy), 0.0, atol=1e-9)

    def test_long_time_limit_is_maxwellian(self):
        g = _grid(32)
        rsq = g.r_squared()
        np.testing.assert_allclose(
            bkw_f(rsq, 1e3), maxwellian(rsq), rtol=0, atol=1e-12
        )


class TestBatchedMoments:
    def test_leading_ensemble_axis(self):
        g = _grid(16)
        f = bkw_f(g.r_squared(), 6.5)
        batch = np.stack([f, 2.0 * f, 0.5 * f])
        m = moments(batch, np.asarray(g.v), g.dv)
        assert m.mass.shape == (3,)
        assert m.momentum.shape == (3, 3)
        np.testing.assert_allclose(
            np.asarray(m.mass), np.asarray(m.mass[0]) * [1.0, 2.0, 0.5], rtol=1e-12
        )
        # temperature is intensive: scaling f leaves it unchanged
        np.testing.assert_allclose(
            np.asarray(m.temperature), np.asarray(m.temperature[0]), rtol=1e-12
        )


class TestGrid:
    def test_cell_centered(self):
        g = VelocityGrid(nv=32, length=10.0)
        v = g.v
        assert len(v) == 32
        np.testing.assert_allclose(v[0], -10.0 + g.dv / 2)
        np.testing.assert_allclose(v[-1], 10.0 - g.dv / 2)
        np.testing.assert_allclose(np.diff(v), g.dv)
        # symmetric about 0
        np.testing.assert_allclose(v + v[::-1], 0.0, atol=1e-14)
