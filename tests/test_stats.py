"""Timing statistics and error-norm helpers."""

import numpy as np

from boltzfft import RunStats, error_norms, time_fn


class TestRunStats:
    def test_basic(self):
        s = RunStats.from_times([1.0, 2.0, 3.0])
        assert s.mean == 2.0 and s.minimum == 1.0 and s.maximum == 3.0
        np.testing.assert_allclose(s.stdev, 1.0)
        assert s.n == 3

    def test_single_trial_stdev(self):
        assert RunStats.from_times([0.5]).stdev == 0.0

    def test_summary_format(self):
        out = RunStats.from_times([1e-3, 2e-3]).summary("FFTW")
        assert "Statistics for FFTW" in out
        assert "mean: 1.5000e-03" in out


class TestTimeFn:
    def test_times_jax_fn(self):
        import jax.numpy as jnp

        stats, out = time_fn(lambda x: jnp.sum(x * x), jnp.arange(1000.0), trials=3, warmup=1)
        assert stats.n == 3
        assert stats.minimum > 0
        np.testing.assert_allclose(float(out), float(np.sum(np.arange(1000.0) ** 2)))


class TestTrace:
    def test_profiler_trace_writes(self, tmp_path):
        import jax.numpy as jnp

        from boltzfft import trace

        with trace(str(tmp_path)):
            float(jnp.sum(jnp.arange(64.0) ** 2))
        # jax profiler lays down a plugins/ tree with trace events
        produced = list(tmp_path.rglob("*"))
        assert produced, "profiler trace produced no files"


class TestErrorNorms:
    def test_reference_scaling(self):
        # L2 = sqrt(dv^3 * sum diff^2) — the reference's exact convention
        # (maxwell_bkw_fftw.cpp:159-161).
        q = np.array([1.0, 2.0])
        q_ref = np.array([0.0, 0.0])
        dv = 0.5
        e = error_norms(q, q_ref, dv)
        np.testing.assert_allclose(e["L1"], dv**3 * 3.0)
        np.testing.assert_allclose(e["L2"], np.sqrt(dv**3 * 5.0))
        np.testing.assert_allclose(e["Linf"], 2.0)
