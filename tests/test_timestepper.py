"""Time integration: convergence on a scalar ODE and BKW relaxation accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

import boltzfft as bz


class TestSteppers:
    @pytest.mark.parametrize(
        "method,order", [("euler", 1), ("rk2", 2), ("rk4", 4)]
    )
    def test_convergence_order(self, method, order):
        # dy/dt = -y, y(0)=1 -> y(1) = 1/e; halving dt must cut error ~2^order.
        rhs = lambda y: -y
        errs = []
        for n in (16, 32):
            traj = bz.relax(rhs, jnp.array(1.0), 1.0 / n, n, method=method)
            errs.append(abs(float(traj.f) - np.exp(-1.0)))
        rate = np.log2(errs[0] / errs[1])
        assert rate > order - 0.35, (errs, rate)

    def test_bad_method(self):
        with pytest.raises(ValueError):
            bz.relax(lambda y: y, jnp.array(1.0), 0.1, 1, method="leapfrog")


class TestBKWRelaxation:
    def test_rk4_follows_analytic_solution(self):
        # Integrate f_bkw(t=5.5) forward one unit of time; the trajectory must
        # land on f_bkw(t=6.5) up to the operator's quadrature error.
        cfg = bz.CollisionConfig(nv=16, ns=6, impl="rfft")
        coll, pre = bz.make_collision_operator(cfg, jit=False)
        g = cfg.velocity_grid
        rsq = g.r_squared()
        f0 = jnp.asarray(bz.bkw_f(rsq, 5.5))
        run = bz.make_relaxation(coll, pre, dt=0.125, n_steps=8, method="rk4")
        traj = run(f0)
        f_exact = bz.bkw_f(rsq, 6.5)
        err = np.abs(np.asarray(traj.f) - f_exact).max()
        # operator Linf error ~5.5e-4 at this resolution over Dt=1
        assert err < 1e-3, err

    def test_h_theorem_entropy_decreases(self):
        # Boltzmann H-theorem: H = sum f log f dv^3 must decrease
        # monotonically along the relaxation df/dt = Q(f,f), and is
        # minimized (among states with f's moments) by the Maxwellian —
        # a physics probe of the whole pipeline that needs no analytic
        # solution.  Nv=32: the entropy integrand amplifies tail-cell f
        # error by |log f| (~40 at the grid edge), so coarser grids
        # (probed: 16^3, 24^3) show non-monotone H on exact BKW data —
        # a quadrature artifact, not a pipeline bug.
        cfg = bz.CollisionConfig(nv=32, ns=6, impl="rfft")
        coll, pre = bz.make_collision_operator(cfg, jit=False)
        g = cfg.velocity_grid
        f0 = jnp.asarray(bz.bkw_f(g.r_squared(), 5.5))
        record = lambda f: bz.entropy(f, g.dv)
        run = bz.make_relaxation(
            coll, pre, dt=0.25, n_steps=6, method="rk4", record=record
        )
        traj = run(f0)
        h = np.asarray(traj.recorded, np.float64)
        h0 = float(bz.entropy(f0, g.dv))
        trace = np.concatenate(([h0], h))
        steps = np.diff(trace)
        assert np.all(steps < 0.0), trace
        # dissipation slows as f approaches equilibrium
        assert abs(steps[-1]) < 0.5 * abs(steps[0]), steps
        # Gibbs floor: the co-moment Maxwellian minimizes H.  The discrete
        # trajectory may overshoot the sampled-Maxwellian H by the grid's
        # tail-quadrature error (measured 1.6e-3 here), never by more.
        h_eq = float(
            bz.entropy(jnp.asarray(bz.maxwellian(g.r_squared())), g.dv)
        )
        gap0 = h0 - h_eq
        assert gap0 > 0.0, (h0, h_eq)
        assert trace[-1] > h_eq - 0.05 * gap0, (trace[-1], h_eq, gap0)
        # ... and the run ends close to equilibrium
        assert abs(trace[-1] - h_eq) < 0.1 * gap0, (trace, h_eq)

    def test_entropy_nonpositive_convention(self):
        # cells with f <= 0 contribute exactly 0 (continuous limit of
        # f log f), so spectral undershoots keep the diagnostic finite
        f = jnp.zeros((4, 4, 4)).at[0, 0, 0].set(-1e-3).at[1, 1, 1].set(1.0)
        h = float(bz.entropy(f, 1.0))
        assert np.isfinite(h) and h == 0.0  # 1*log(1) = 0, rest masked

    def test_moments_recorded_and_conserved(self):
        # Nv=24: coarse enough to be fast, fine enough that the quadrature
        # conservation error (which bounds the drift) is small.  At Nv=16 the
        # method genuinely loses O(0.2) energy per unit time — tails of Q carry
        # L1-level error weighted by |v|^2 — so that grid can't test this.
        cfg = bz.CollisionConfig(nv=24, ns=6, impl="rfft")
        coll, pre = bz.make_collision_operator(cfg, jit=False)
        g = cfg.velocity_grid
        v = jnp.asarray(g.v)
        f0 = jnp.asarray(bz.bkw_f(g.r_squared(), 5.5))
        record = lambda f: bz.moments(f, v, g.dv)
        run = bz.make_relaxation(coll, pre, dt=0.2, n_steps=3, record=record)
        traj = run(f0)
        m = traj.recorded
        assert m.mass.shape == (3,)
        np.testing.assert_allclose(np.asarray(m.mass), 1.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(m.energy), 1.5, atol=5e-2)
        np.testing.assert_allclose(np.asarray(m.momentum), 0.0, atol=1e-10)
