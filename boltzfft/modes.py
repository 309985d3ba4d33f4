"""Integer Fourier-mode tables in FFT (wrap-around) order.

The spectral method indexes modes ``l = (lx, ly, lz)`` in the standard FFT
ordering ``0, 1, ..., N/2-1, -N/2, ..., -1`` (reference:
``Collisions/FFTWBoltzmannOperator.cpp:50-57``).  For the real-input (rfft)
fast path the last axis keeps only the non-negative half ``0..N/2`` with the
Nyquist entry mapped to ``-N/2`` for phase consistency with the c2c ordering.
"""

from __future__ import annotations

import numpy as np


def fft_modes(n: int) -> np.ndarray:
    """FFT-order integer modes for an axis of length ``n`` (n even or odd).

    For even ``n`` this is ``0..n/2-1, -n/2..-1`` — identical to the mode
    vectors built at ``FFTWBoltzmannOperator.cpp:50-57`` and to
    ``numpy.fft.fftfreq(n) * n``.
    """
    return np.fft.fftfreq(n, d=1.0 / n).astype(np.float64)


def rfft_modes(n: int) -> np.ndarray:
    """Half-axis modes for the last axis of an rfft of length ``n``.

    Entries ``0..n/2`` with the Nyquist mode stored as ``-n/2`` so that phase
    factors agree with the full c2c mode table (which places ``-n/2`` at index
    ``n/2``).  The Nyquist plane of any Hermitian product is symmetrized by
    ``irfftn``, so this choice only affects terms at/below the spectral floor.
    """
    m = np.arange(n // 2 + 1, dtype=np.float64)
    if n % 2 == 0:
        m[-1] = -(n // 2)
    return m


def mode_norm_grid(lx: np.ndarray, ly: np.ndarray, lz: np.ndarray) -> np.ndarray:
    """``|l|`` on the 3-D tensor grid of the given per-axis mode tables."""
    return np.sqrt(
        lx[:, None, None] ** 2 + ly[None, :, None] ** 2 + lz[None, None, :] ** 2
    )
