"""BKW (Bobylev-Krook-Wu) analytic solution for Maxwell molecules.

The BKW solution is the classical closed-form solution of the spatially
homogeneous Boltzmann equation for Maxwell molecules (``gamma = 0``,
``b_gamma = 1/(4*pi)``).  It is the accuracy oracle: the computed collision
operator ``Q(f_bkw, f_bkw)`` must match the analytic time derivative
``df/dt`` to spectral accuracy (reference: ``maxwell_bkw_fftw.cpp:74-99``).

With ``K(t) = 1 - exp(-t/6)``:

    f(v, t) = 1/(2 (2 pi K)^{3/2}) * exp(-|v|^2/(2K))
              * ((5K - 3)/K + (1 - K)/K^2 * |v|^2)

and ``Q = df/dt`` by the chain rule through ``K`` (``maxwell_bkw_fftw.cpp:94-96``).
These are NumPy host-side builders (float64); cast to the compute dtype at the
device boundary.
"""

from __future__ import annotations

import numpy as np


def bkw_k(t: float) -> float:
    """``K(t) = 1 - exp(-t/6)``."""
    return 1.0 - np.exp(-t / 6.0)


def bkw_f(r_squared: np.ndarray, t: float) -> np.ndarray:
    """BKW distribution at time ``t`` given ``|v|^2`` on the grid."""
    k = bkw_k(t)
    pref = 1.0 / (2.0 * (2.0 * np.pi * k) ** 1.5)
    return pref * np.exp(-r_squared / (2.0 * k)) * (
        (5.0 * k - 3.0) / k + (1.0 - k) / k**2 * r_squared
    )


def bkw_dfdt(r_squared: np.ndarray, t: float) -> np.ndarray:
    """Analytic ``df/dt`` of the BKW solution — the collision-operator oracle.

    Chain rule through K, matching ``maxwell_bkw_fftw.cpp:94-96`` exactly:
    ``dK/dt = exp(-t/6)/6``.
    """
    k = bkw_k(t)
    dk = np.exp(-t / 6.0) / 6.0
    f = bkw_f(r_squared, t)
    pref = 1.0 / (2.0 * (2.0 * np.pi * k) ** 1.5)
    q = (-3.0 / (2.0 * k) + r_squared / (2.0 * k**2)) * f
    q = q + pref * np.exp(-r_squared / (2.0 * k)) * (
        3.0 / k**2 + (k - 2.0) / k**3 * r_squared
    )
    return q * dk


def maxwellian(r_squared: np.ndarray, density: float = 1.0, temperature: float = 1.0) -> np.ndarray:
    """Isotropic Maxwellian equilibrium (the t -> inf limit of BKW)."""
    pref = density / (2.0 * np.pi * temperature) ** 1.5
    return pref * np.exp(-r_squared / (2.0 * temperature))
