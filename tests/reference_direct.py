"""Slow, independent NumPy implementation of the collision operator.

Written directly from the math (SURVEY.md section 1), node by node with plain
``numpy.fft`` c2c transforms and explicit complex arithmetic — deliberately
sharing no code with ``boltzfft.operator`` so it can serve as a parity oracle
for the fast paths (the pytest analog of the reference's cross-backend
consistency checks).
"""

from __future__ import annotations

import numpy as np


def sincc(x: np.ndarray) -> np.ndarray:
    eps = np.finfo(np.float64).eps
    return np.sin(x + eps) / (x + eps)


def direct_collision(
    f: np.ndarray,
    gl_nodes: np.ndarray,
    gl_weights: np.ndarray,
    sigma: np.ndarray,  # (S, 3)
    sph_weights: np.ndarray,
    length: float,
    gamma: float = 0.0,
    b_gamma: float = 1.0 / (4.0 * np.pi),
) -> np.ndarray:
    """O(B) loop over quadrature nodes; unnormalized-forward FFT convention
    with explicit 1/N scaling, exactly like the reference.  Supports
    anisotropic grids (per-axis mode tables from ``f.shape``)."""
    nx, ny, nz = f.shape
    lx = np.fft.fftfreq(nx, 1.0 / nx)[:, None, None]
    ly = np.fft.fftfreq(ny, 1.0 / ny)[None, :, None]
    lz = np.fft.fftfreq(nz, 1.0 / nz)[None, None, :]
    norm_l = np.sqrt(lx**2 + ly**2 + lz**2)

    f_hat = np.fft.fftn(f.astype(np.complex128))

    q_gain_hat = np.zeros_like(f_hat)
    for r in range(len(gl_nodes)):
        rho = gl_nodes[r]
        beta1 = 4.0 * np.pi * b_gamma * sincc(np.pi * rho * norm_l / (2.0 * length))
        for s in range(sigma.shape[0]):
            l_dot_sigma = lx * sigma[s, 0] + ly * sigma[s, 1] + lz * sigma[s, 2]
            alpha1 = np.exp(-1j * (np.pi / (2.0 * length)) * rho * l_dot_sigma)
            g1 = np.fft.ifftn(alpha1 * f_hat)  # numpy ifftn includes 1/N
            g2 = np.fft.ifftn(np.conj(alpha1) * f_hat)
            h_hat = np.fft.fftn(g1 * g2)
            w = gl_weights[r] * sph_weights[s] * rho ** (gamma + 2.0)
            q_gain_hat += w * beta1 * h_hat

    beta2 = np.zeros_like(norm_l)
    for r in range(len(gl_nodes)):
        rho = gl_nodes[r]
        beta2 += (
            16.0
            * np.pi**2
            * b_gamma
            * gl_weights[r]
            * rho ** (gamma + 2.0)
            * sincc(np.pi * rho * norm_l / length)
        )

    q_gain = np.fft.ifftn(q_gain_hat).real
    loss_conv = np.fft.ifftn(beta2 * f_hat).real
    return q_gain - loss_conv * f
