"""On-device moments of a velocity distribution (mass/momentum/energy/temperature).

The reference has no moments module (its ``statistics.hpp`` does run-timing
stats only); the BASELINE north-star asks for on-device moments computed inside
the jitted step.  These are jittable jnp reductions over the (cell-centered)
velocity grid; conservation of the first five moments of ``Q`` (mass, momentum,
energy) to spectral accuracy is a correctness probe used by the test suite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Moments(NamedTuple):
    mass: jnp.ndarray  # rho            = sum f dv^3
    momentum: jnp.ndarray  # (3,)        = sum v f dv^3
    energy: jnp.ndarray  # 0.5 sum |v|^2 f dv^3
    temperature: jnp.ndarray  # T = (2E/rho - |u|^2) / 3


def _cell_weight(dv, cell_volume):
    if cell_volume is None and dv is None:
        raise ValueError("pass dv or cell_volume")
    return cell_volume if cell_volume is not None else dv**3


def entropy(f: jnp.ndarray, dv: float | None = None, *,
            cell_volume: float | None = None) -> jnp.ndarray:
    """Boltzmann H functional ``H(f) = sum f*log(f) dv^3`` over the trailing
    velocity axes (leading axes, e.g. an ensemble or cell axis, broadcast).

    The H-theorem says ``dH/dt <= 0`` along the homogeneous relaxation
    ``df/dt = Q(f, f)``, with equality exactly at the Maxwellian sharing
    f's mass/momentum/energy — so a monotone H trace is a physics probe of
    the whole collision pipeline that needs no analytic solution (the test
    suite asserts it along BKW relaxations, and that the co-moment
    Maxwellian minimizes H; the reference has no entropy diagnostic — its
    ``Utilities/statistics.hpp`` is run-timing stats only).

    Convention for non-positive values: spectral collision updates can
    undershoot to tiny negative f in the tails; those cells contribute 0
    (the continuous integrand ``f log f -> 0`` as ``f -> 0+``), keeping the
    diagnostic finite without masking genuine physics.
    """
    w = _cell_weight(dv, cell_volume)
    pos = f > 0.0
    safe = jnp.where(pos, f, 1.0)
    return jnp.sum(jnp.where(pos, safe * jnp.log(safe), 0.0),
                   axis=(-3, -2, -1)) * w


def moments(f: jnp.ndarray, v, dv: float | None = None, *,
            cell_volume: float | None = None) -> Moments:
    """Compute moments of ``f`` on the tensor grid with 1-D coordinates ``v``.

    ``f`` has shape (..., Nx, Ny, Nz) — leading axes (e.g. an ensemble axis)
    are broadcast through.  ``v`` is the shared 1-D coordinate array (cubic
    grids) or a ``(vx, vy, vz)`` tuple (anisotropic grids, in which case pass
    ``cell_volume`` from ``VelocityGrid.cell_volume`` instead of ``dv``).
    """
    if isinstance(v, (tuple, list)):
        vx, vy, vz = v
        if cell_volume is None:
            raise ValueError("anisotropic moments need cell_volume, not dv")
        w = cell_volume
    else:
        vx = vy = vz = v
        w = _cell_weight(dv, cell_volume)
    mass = jnp.sum(f, axis=(-3, -2, -1)) * w
    mx = jnp.sum(f * vx[:, None, None], axis=(-3, -2, -1)) * w
    my = jnp.sum(f * vy[None, :, None], axis=(-3, -2, -1)) * w
    mz = jnp.sum(f * vz[None, None, :], axis=(-3, -2, -1)) * w
    momentum = jnp.stack([mx, my, mz], axis=-1)
    r_sq = (
        vx[:, None, None] ** 2 + vy[None, :, None] ** 2 + vz[None, None, :] ** 2
    )
    energy = 0.5 * jnp.sum(f * r_sq, axis=(-3, -2, -1)) * w
    u_sq = jnp.sum((momentum / mass[..., None]) ** 2, axis=-1)
    temperature = (2.0 * energy / mass - u_sq) / 3.0
    return Moments(mass=mass, momentum=momentum, energy=energy, temperature=temperature)
