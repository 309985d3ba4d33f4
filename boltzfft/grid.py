"""Velocity-space grid and spectral-domain constants.

The method works on a uniform, cell-centered tensor grid on ``[-L, L]^3``:
``v_i = -L + dv/2 + i*dv`` with ``dv = 2L/Nv`` (reference:
``maxwell_bkw_fftw.cpp:63-68``).  The anti-aliasing domain constants follow the
standard choice for the fast spectral method: support radius ``S``, radial
quadrature interval ``[0, R] = [0, 2S]``, and ``L = ((3 + sqrt(2))/2) * S``
(``maxwell_bkw_fftw.cpp:58-60``).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class VelocityGrid:
    """Uniform cell-centered velocity grid on ``[-L, L]^3``."""

    nv: int
    length: float  # domain half-width L

    @property
    def dv(self) -> float:
        return 2.0 * self.length / self.nv

    @property
    def v(self) -> np.ndarray:
        """1-D cell-centered coordinates (shared by all three axes)."""
        return -self.length + self.dv * (0.5 + np.arange(self.nv))

    def meshgrid(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        v = self.v
        return np.meshgrid(v, v, v, indexing="ij")

    def r_squared(self) -> np.ndarray:
        """``|v|^2`` on the 3-D grid."""
        v = self.v
        return (
            v[:, None, None] ** 2 + v[None, :, None] ** 2 + v[None, None, :] ** 2
        )


def domain_from_support(support_radius: float = 5.0) -> tuple[float, float]:
    """Return ``(R, L)`` for a distribution supported in ``|v| < S``.

    ``R = 2S`` bounds the relative-velocity magnitude; ``L = ((3+sqrt(2))/2) S``
    is the dealiasing-optimal half-width (``maxwell_bkw_fftw.cpp:58-60``).
    """
    s = support_radius
    return 2.0 * s, 0.5 * (3.0 + np.sqrt(2.0)) * s
