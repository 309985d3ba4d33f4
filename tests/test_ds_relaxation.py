"""ds-state time integration: f64-class relaxations on f32 pairs."""

import numpy as np
import jax.numpy as jnp

import boltzfft as bz
from boltzfft import ds


class TestDsRelaxation:
    def test_rk4_matches_f64_relaxation(self):
        cfg64 = bz.CollisionConfig(nv=6, ns=6, n_radial=3, impl="c2c",
                                   dtype="float64")
        c64, p64 = bz.make_collision_operator(cfg64)
        g = cfg64.velocity_grid
        f0 = jnp.asarray(np.asarray(bz.bkw_f(g.r_squared(), 5.5), np.float64))
        tf64 = np.asarray(bz.make_relaxation(
            c64, p64, dt=0.25, n_steps=4, method="rk4")(f0).f)

        cfg = bz.CollisionConfig(nv=6, ns=6, n_radial=3, impl="c2c",
                                 dtype="float32")
        cds, pds = bz.make_ds_collision_operator(cfg, jit=False)
        run = bz.make_relaxation(cds, pds, dt=0.25, n_steps=4, method="rk4")
        tf_ds = ds.to_f64(run(ds.from_f64(np.asarray(f0))).f)
        rel = np.abs(tf_ds - tf64).max() / np.abs(tf64).max()
        # f32-pair state tracks the f64 integration to ~double precision;
        # plain f32 would land around 1e-6 here
        assert rel < 1e-12

    def test_recording_through_ds_state(self):
        cfg = bz.CollisionConfig(nv=6, ns=6, n_radial=2, impl="c2c",
                                 dtype="float32")
        cds, pds = bz.make_ds_collision_operator(cfg, jit=False)
        g = cfg.velocity_grid
        f0 = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 5.5), np.float64))
        v = jnp.asarray(g.v, jnp.float32)
        run = bz.make_relaxation(
            cds, pds, dt=0.25, n_steps=3, method="rk2",
            record=lambda f: bz.moments(f.hi + f.lo, v, g.dv),
        )
        traj = run(f0)
        assert traj.recorded.mass.shape == (3,)
        assert np.all(np.isfinite(np.asarray(traj.recorded.mass)))
