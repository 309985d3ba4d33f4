"""Native C++ runtime library: build + parity with NumPy references."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _ensure_built():
    lib = REPO / "boltzfft" / "_lib" / "libboltzfft_native.so"
    if lib.exists():
        return True
    if shutil.which("g++") is None:
        return False
    subprocess.run(["make", "-C", str(REPO / "native")], check=True, capture_output=True)
    return lib.exists()


pytestmark = pytest.mark.skipif(not _ensure_built(), reason="no C++ toolchain")


class TestLeggauss:
    @pytest.mark.parametrize("n", [1, 2, 5, 16, 32, 64, 200])
    def test_matches_numpy(self, n):
        from boltzfft import _native

        xn, wn = _native.leggauss(n)
        xr, wr = np.polynomial.legendre.leggauss(n)
        np.testing.assert_allclose(xn, xr, atol=5e-15)
        np.testing.assert_allclose(wn, wr, atol=5e-14)

    def test_weights_sum(self):
        from boltzfft import _native

        _, w = _native.leggauss(50)
        np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-15)

    def test_bad_n(self):
        from boltzfft import _native

        with pytest.raises(ValueError):
            _native.leggauss(0)


class TestRunningStats:
    def test_matches_numpy(self):
        from boltzfft import _native

        rng = np.random.RandomState(0)
        x = rng.exponential(1e-3, size=1000)
        mean, mn, mx, stdev = _native.running_stats(x)
        np.testing.assert_allclose(mean, x.mean(), rtol=1e-14)
        assert mn == x.min() and mx == x.max()
        np.testing.assert_allclose(stdev, x.std(ddof=1), rtol=1e-12)

    def test_single_sample(self):
        from boltzfft import _native

        assert _native.running_stats([2.5]) == (2.5, 2.5, 2.5, 0.0)


class TestQuadratureUsesNative:
    def test_gauss_legendre_path(self):
        # gauss_legendre prefers the native rule; results must satisfy the
        # same exactness regardless of which backend produced them.
        import boltzfft as bz

        rule = bz.gauss_legendre(32, 0.0, 10.0)
        exact = 10.0**5 / 5
        np.testing.assert_allclose(
            np.sum(rule.weights * rule.nodes**4), exact, rtol=1e-14
        )
