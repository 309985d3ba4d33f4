"""Conservative moment projection (boltzfft.conserve)."""

import jax.numpy as jnp
import numpy as np
import pytest

import boltzfft as bz


class TestProjection:
    def _q(self, nv=16, ns=6):
        cfg = bz.CollisionConfig(nv=nv, ns=ns)
        collide, pre = bz.make_collision_operator(cfg, jit=False)
        g = cfg.velocity_grid
        f = jnp.asarray(bz.bkw_f(g.r_squared(), 6.5))
        return cfg, g, collide(f, pre)

    def test_moments_vanish_to_roundoff(self):
        cfg, g, q = self._q()
        cp = bz.build_conserve_precomp(cfg)
        qp = bz.project(q, cp)
        m = bz.moments(qp, jnp.asarray(g.v), g.dv)
        # residuals are f64 roundoff of the removed defect (the raw
        # energy defect at 16^3 is O(0.17) — genuinely lost by the
        # method at this coarse grid)
        m0 = bz.moments(q, jnp.asarray(g.v), g.dv)
        defect = abs(float(m0.energy))
        assert defect > 1e-2
        assert abs(float(m.mass)) < 1e-13 * defect
        assert float(jnp.max(jnp.abs(m.momentum))) < 1e-13 * defect
        assert abs(float(m.energy)) < 1e-12 * defect

    def test_projection_is_idempotent_and_linear(self):
        cfg, _, q = self._q()
        cp = bz.build_conserve_precomp(cfg)
        qp = bz.project(q, cp)
        np.testing.assert_allclose(
            np.asarray(bz.project(qp, cp)), np.asarray(qp),
            atol=1e-14 * float(jnp.max(jnp.abs(q))),
        )
        np.testing.assert_allclose(
            np.asarray(bz.project(2.0 * q, cp)), 2.0 * np.asarray(qp),
            rtol=1e-12,
        )

    def test_batch_broadcast(self):
        cfg, _, q = self._q()
        cp = bz.build_conserve_precomp(cfg)
        qb = bz.project(jnp.stack([q, 3.0 * q]), cp)
        np.testing.assert_allclose(
            np.asarray(qb[0]), np.asarray(bz.project(q, cp)), rtol=1e-12
        )

    def test_pointwise_perturbation_stays_in_error_class(self):
        # resolved grid: the projection spends the (small) moment defect
        # pointwise; measured 4.25e-5 -> 4.94e-5 at 32^3/Ns=12 (f64).
        # At 16^3 the method's genuine O(0.17) energy defect makes the
        # perturbation larger — use the resolved grid for this assertion.
        cfg, g, q = self._q(nv=32, ns=12)
        cp = bz.build_conserve_precomp(cfg)
        qp = bz.project(q, cp)
        tr = np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5))
        e_raw = bz.error_norms(np.asarray(q), tr, g.dv)["Linf"]
        e_prj = bz.error_norms(np.asarray(qp), tr, g.dv)["Linf"]
        assert e_prj < 1.5 * e_raw, (e_raw, e_prj)

    def test_conservative_wrapper(self):
        cfg = bz.CollisionConfig(nv=8, ns=6, n_radial=2)
        collide, pre = bz.make_collision_operator(cfg, jit=False)
        cp = bz.build_conserve_precomp(cfg)
        g = cfg.velocity_grid
        f = jnp.asarray(bz.bkw_f(g.r_squared(), 6.5))
        q = bz.conservative(collide, cp)(f, pre)
        m = bz.moments(q, jnp.asarray(g.v), g.dv)
        assert abs(float(m.mass)) < 1e-12
        assert abs(float(m.energy)) < 1e-11


class TestDriverFlag:
    def test_sod_conserve_flag(self, capsys):
        from boltzfft.cli.sod_1d3v import main

        assert main(["--Nv", "8", "--Ns", "6", "--nx", "8", "--steps", "2",
                     "--conserve"]) == 0
        out = capsys.readouterr().out
        # with per-eval projection the collision substep conserves mass
        # exactly; remaining drift is transport/f32 roundoff class
        drift = float(out.split("rel drift ")[1].split(")")[0])
        assert drift < 1e-6, out

    def test_taylor_green_conserve_flag(self, capsys):
        from boltzfft.cli.taylor_green_2d3v import main

        assert main(["--cells", "4", "--Nv", "8", "--Ns", "6",
                     "--steps", "2", "--n-radial", "4", "--conserve",
                     "--mass-tol", "1e-5"]) == 0
        out = capsys.readouterr().out
        assert "bulk-KE" in out

    def test_anisotropic_grid(self):
        # per-axis coordinates and cell_volume flow through the basis
        # build; moments (computed with the anisotropic convention)
        # still vanish
        cfg = bz.CollisionConfig(nv=8, nvy=12, nvz=10, ns=6, n_radial=2)
        collide, pre = bz.make_collision_operator(cfg, jit=False)
        cp = bz.build_conserve_precomp(cfg)
        g = cfg.velocity_grid
        f = jnp.asarray(bz.bkw_f(g.r_squared(), 6.5))
        qp = bz.project(collide(f, pre), cp)
        m = bz.moments(
            qp, (jnp.asarray(g.vx), jnp.asarray(g.vy), jnp.asarray(g.vz)),
            cell_volume=g.cell_volume,
        )
        assert abs(float(m.mass)) < 1e-12
        assert float(jnp.max(jnp.abs(m.momentum))) < 1e-12
        assert abs(float(m.energy)) < 1e-11
