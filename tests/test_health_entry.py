"""Self-check utility and the driver entry-point contract."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TestSelfcheck:
    def test_passes_on_cpu(self):
        from boltzfft.health import selfcheck

        r = selfcheck()
        assert r["ok"], r
        assert r["finite"]
        assert r["rel_linf"] < r["rel_tol"]
        assert r["backend"] == "cpu"

    def test_passes_fused_impl(self):
        from boltzfft.health import selfcheck

        r = selfcheck(impl="fused", dtype="float32")
        assert r["ok"], r

    def test_detects_corrupted_weights(self):
        """Known-answer property: a wrong-but-bounded Q must FAIL. Corrupt
        the loss multiplier (beta2 x2) and the gain weights (x0.5) — each is
        the class of silent numerical fault an amplitude envelope misses."""
        from boltzfft.health import selfcheck

        r = selfcheck(pre_transform=lambda p: p._replace(beta2=2.0 * p.beta2))
        assert not r["ok"], r
        assert r["finite"]

        r = selfcheck(
            pre_transform=lambda p: p._replace(gain_w=0.5 * p.gain_w)
        )
        assert not r["ok"], r


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge

        fn, (f, pre) = ge.entry()
        q = jax.jit(fn)(f, pre)
        assert q.shape == f.shape
        assert np.all(np.isfinite(np.asarray(q)))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_dryrun_multichip(self, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        # round-3: one ok line per operator family
        for fam in ("[rfft]", "[fused]", "[ds]"):
            assert f"dryrun_multichip ok {fam}" in out

    @pytest.mark.slow
    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_dryrun_multichip_odd_mesh(self, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)
        assert "dryrun_multichip ok" in capsys.readouterr().out

    def test_dryrun_subprocess_fallback(self):
        """Driver-env emulation (MULTICHIP_r01 regression): the calling
        process has a single-device backend already initialized; the entry
        point must still complete by re-executing in a clean subprocess."""
        import os
        import subprocess

        repo = str(Path(__file__).resolve().parent.parent)
        env = dict(os.environ)
        env["PYTHONPATH"] = repo
        # single CPU device, backend initialized before the dryrun call —
        # exactly the shape of the driver failure (1 device visible)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        # one family suffices here — this test covers the clean-subprocess
        # re-exec mechanics; all three families run in test_dryrun_multichip
        env["BOLTZFFT_DRYRUN_FAMILIES"] = "rfft"
        code = (
            "import jax; assert len(jax.devices()) == 1;"
            "import __graft_entry__ as g; g.dryrun_multichip(8)"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=repo, env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "dryrun_multichip ok" in proc.stdout
