"""Orbax checkpoint/resume of relaxation state (reference has no analog —
its only persisted artifact is the FFTW wisdom plan cache)."""

import numpy as np
import pytest

import boltzfft as bz


@pytest.fixture
def cfg():
    return bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="rfft")


def _setup(cfg):
    coll, pre = bz.make_collision_operator(cfg)
    g = cfg.velocity_grid
    f0 = np.asarray(bz.bkw_f(g.r_squared(), 6.0), np.float64)
    return coll, pre, f0


class TestRelaxCheckpointer:
    def test_roundtrip(self, tmp_path, cfg):
        import jax.numpy as jnp

        _, _, f0 = _setup(cfg)
        with bz.RelaxCheckpointer(tmp_path / "ck") as ck:
            assert ck.latest_step() is None
            ck.save(3, jnp.asarray(f0), 0.75)
            ck.wait()
            assert ck.latest_step() == 3
            f, t = ck.restore()
        assert t == 0.75
        np.testing.assert_array_equal(np.asarray(f), f0)

    def test_restore_missing_raises(self, tmp_path):
        with bz.RelaxCheckpointer(tmp_path / "empty") as ck:
            with pytest.raises(FileNotFoundError):
                ck.restore()

    def test_retention(self, tmp_path, cfg):
        import jax.numpy as jnp

        _, _, f0 = _setup(cfg)
        with bz.RelaxCheckpointer(tmp_path / "ck", max_to_keep=2) as ck:
            for s in (1, 2, 3):
                ck.save(s, jnp.asarray(f0), float(s))
            ck.wait()
            assert ck.latest_step() == 3
            f, t = ck.restore(3)
            assert t == 3.0

    def test_resume_equals_uninterrupted(self, tmp_path, cfg):
        # 4 RK4 steps straight through == 2 steps, checkpoint, restore, 2 more
        import jax.numpy as jnp

        coll, pre, f0 = _setup(cfg)
        rhs = lambda f: coll(f, pre)
        f0 = jnp.asarray(f0)

        f_straight = bz.relax(rhs, f0, dt=0.05, n_steps=4, method="rk4").f

        f_half = bz.relax(rhs, f0, dt=0.05, n_steps=2, method="rk4").f
        with bz.RelaxCheckpointer(tmp_path / "ck") as ck:
            ck.save(2, f_half, 0.1)
            ck.wait()
            f_rest, t = ck.restore(template=f_half)
        assert t == 0.1
        f_resumed = bz.relax(rhs, f_rest, dt=0.05, n_steps=2, method="rk4").f
        np.testing.assert_array_equal(
            np.asarray(f_resumed), np.asarray(f_straight)
        )  # bitwise: checkpointing must not perturb the trajectory


class TestEnsembleCLICheckpoint:
    def test_cli_resume_flow(self, tmp_path, capsys):
        from boltzfft.cli.ensemble_bkw import main

        ckdir = str(tmp_path / "ck")
        argv = ["--Nv", "8", "--Ns", "6", "--ensemble", "2", "--steps", "4",
                "--dt", "0.05", "--checkpoint-dir", ckdir,
                "--checkpoint-every", "2", "--ens-mesh", "1"]
        assert main(argv) == 0
        out1 = capsys.readouterr().out
        assert "step 4/4" in out1
        # second invocation resumes at the final step and does nothing
        assert main(argv) == 0
        out2 = capsys.readouterr().out
        assert "resumed from step 4" in out2
        assert "nothing to do" in out2
