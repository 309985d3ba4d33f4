"""Quadrature rules for the Boltzmann collision kernel decomposition.

The fast spectral method decomposes the collision kernel over a tensor-product
quadrature: an ``n``-point Gauss-Legendre rule in the radial direction on
``[0, R]`` and a symmetric spherical t-design on the unit sphere.

Reference parity:
  * Gauss-Legendre: the reference uses GSL ``gsl_integration_glfixed_table``
    (``Quadratures/GaussLegendre.hpp:10-24``).  Here the nodes/weights come from
    the native C++ extension (Newton iteration in ``long double``; see
    ``native/boltzfft_native.cpp``) when available, with a NumPy
    ``leggauss`` fallback — both agree with GSL to ~1 ulp.
  * Spherical designs: the reference loads whitespace-separated node tables
    (``Quadratures/SphericalDesign.cpp:6-50``) from hard-coded absolute paths;
    the same public node tables ship inside the package (``boltzfft/data/``) and
    are resolved relative to the package, fixing that wart.  Weights are the
    equal-area weights ``4*pi/N`` (``SphericalDesign.cpp:48``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

_DATA_DIR = Path(__file__).resolve().parent / "data"

#: Available spherical design sizes -> packaged node-table file.
#: (strength t=3..19; same tables the reference ships, SphericalDesign.cpp:12-24)
SPHERICAL_DESIGN_FILES = {
    6: "ss003.006.txt",
    12: "ss005.012.txt",
    32: "ss007.032.txt",
    48: "ss009.048.txt",
    70: "ss011.070.txt",
    94: "ss013.094.txt",
    120: "ss015.120.txt",
    156: "ss017.156.txt",
    192: "ss019.192.txt",
}


@dataclasses.dataclass(frozen=True)
class Quadrature1D:
    """A 1-D quadrature rule: ``integral f(x) dx ~= sum_i w_i f(x_i)``."""

    nodes: np.ndarray  # (n,) float64
    weights: np.ndarray  # (n,) float64

    @property
    def n(self) -> int:
        return self.nodes.shape[0]


@dataclasses.dataclass(frozen=True)
class SphericalQuadrature:
    """A quadrature rule on the unit sphere S^2.

    ``integral_{S^2} f(sigma) dsigma ~= sum_s w_s f(sigma_s)`` with
    ``sum_s w_s = 4*pi``.
    """

    points: np.ndarray  # (n, 3) float64, unit vectors
    weights: np.ndarray  # (n,) float64

    @property
    def n(self) -> int:
        return self.points.shape[0]

    @property
    def x(self) -> np.ndarray:
        return self.points[:, 0]

    @property
    def y(self) -> np.ndarray:
        return self.points[:, 1]

    @property
    def z(self) -> np.ndarray:
        return self.points[:, 2]


def _leggauss_unit(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on [-1, 1].

    Prefers the native C++ implementation (long-double Newton iteration,
    GSL-equivalent); falls back to ``numpy.polynomial.legendre.leggauss``.
    """
    try:
        from boltzfft import _native

        nodes, weights = _native.leggauss(n)
        return nodes, weights
    except Exception:
        return np.polynomial.legendre.leggauss(n)


def gauss_legendre(n: int, a: float, b: float) -> Quadrature1D:
    """n-point Gauss-Legendre rule on ``[a, b]``.

    Matches the reference's GSL-backed rule (``GaussLegendre.hpp:10-24``); the
    drivers use ``n = Nv`` points on ``[0, 2*S]`` (``maxwell_bkw_fftw.cpp:102``).
    """
    if n <= 0:
        raise ValueError(f"Gauss-Legendre rule needs n >= 1, got {n}")
    t, w = _leggauss_unit(n)
    half = 0.5 * (b - a)
    mid = 0.5 * (b + a)
    return Quadrature1D(nodes=mid + half * t, weights=half * w)


def spherical_design(n: int) -> SphericalQuadrature:
    """Symmetric spherical t-design with ``n`` points and equal weights 4*pi/n.

    Mirrors the reference loader (``SphericalDesign.cpp:6-50``) but resolves the
    packaged node tables instead of hard-coded absolute paths.
    """
    if n not in SPHERICAL_DESIGN_FILES:
        raise ValueError(
            f"No spherical design with {n} points; available: "
            f"{sorted(SPHERICAL_DESIGN_FILES)}"
        )
    path = _DATA_DIR / SPHERICAL_DESIGN_FILES[n]
    pts = np.loadtxt(path, dtype=np.float64)
    if pts.shape != (n, 3):
        raise RuntimeError(f"Bad node table {path}: shape {pts.shape} != ({n}, 3)")
    weights = np.full(n, 4.0 * np.pi / n)
    return SphericalQuadrature(points=pts, weights=weights)


def antipodal_pairs(points: np.ndarray) -> Optional[np.ndarray]:
    """Pair indices ``(n/2, 2)`` if the node set is *exactly* closed under
    ``sigma -> -sigma`` (bit-for-bit), else ``None``.

    All shipped tables are *symmetric* spherical t-designs (the ``ss`` prefix
    of the reference's node files, ``SphericalDesign.cpp:12-24``): every node's
    antipode is in the table, stored with exactly negated coordinates.  This is
    verified here, not assumed, so a user-supplied asymmetric quadrature falls
    back to the full node set.
    """
    n = points.shape[0]
    if n % 2:
        return None
    index = {pt.tobytes(): i for i, pt in enumerate(points)}
    pairs, seen = [], set()
    for i, pt in enumerate(points):
        if i in seen:
            continue
        j = index.get((-pt).tobytes())
        if j is None or j == i or j in seen:
            return None
        pairs.append((i, j))
        seen.update((i, j))
    return np.asarray(pairs, np.int64)


def antipodal_reduce(sph: SphericalQuadrature) -> SphericalQuadrature:
    """Half-design with doubled weights, exact for even integrands.

    The collision pipeline's per-node contribution is even in ``sigma``: the
    shifted convolution factors satisfy ``g2(sigma) = g1(-sigma)`` (alpha2 =
    conj(alpha1) and ``alpha1(-sigma) = conj(alpha1(sigma))``), so the gain
    terms of a node and its antipode are bitwise identical —
    ``w h(sigma) + w h(-sigma) = 2 w h(sigma)`` exactly.  Halving the node set
    with doubled weights therefore halves the dominant per-node work of every
    implementation while reproducing the full-design sum up to summation
    order.  (The reference evaluates all ``Ns`` nodes,
    ``FFTWBoltzmannOperator.cpp:191-276`` — this symmetry is left on the
    table there.)

    Raises ``ValueError`` if the design is not exactly antipodally symmetric.
    """
    pairs = antipodal_pairs(sph.points)
    if pairs is None:
        raise ValueError(
            "spherical quadrature is not exactly antipodally symmetric; "
            "use the full design (antipodal=False)"
        )
    keep = pairs[:, 0]
    return SphericalQuadrature(
        points=sph.points[keep], weights=2.0 * sph.weights[keep]
    )
