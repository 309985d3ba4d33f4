"""Space-inhomogeneous 1D×3V kinetic solver: transport + collisions.

Solves ``df/dt + v_x df/dx = Q(f, f) / Kn`` by Strang operator splitting:
conservative first-order upwind advection along a periodic spatial axis, and
the homogeneous collision operator applied cell-wise (the spatial-cell axis
is exactly the ensemble axis of :mod:`boltzfft.sharding` — cells are
independent during the collision substep and couple only through the
advection stencil).

The reference code is spatially homogeneous by design (SURVEY.md section 0:
"no time-stepping loop, no spatial transport"); this module is the
production story the collision kernel exists to serve.  TPU mapping: cells
shard over the mesh's ensemble axis; the upwind halo exchange is a
nearest-neighbor ``jnp.roll`` that GSPMD lowers to a collective permute over
ICI, while the collision substep runs the shard_map/vmap path with zero
cross-cell traffic.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .weights import CollisionConfig, Precomp


def advect_upwind(f: jnp.ndarray, v_x: jnp.ndarray, dx: float, dt: float):
    """One periodic first-order upwind step of ``df/dt + v_x df/dx = 0``.

    ``f`` has shape ``(Nx, Nv, Nv, Nv)`` (cells leading, velocity axes
    trailing; the first velocity axis is x).  Conservative by construction:
    cell totals change only by fluxes that cancel in the periodic sum.
    """
    v = v_x.reshape(1, -1, 1, 1).astype(f.dtype)
    vp = jnp.maximum(v, 0.0)
    vm = jnp.minimum(v, 0.0)
    c = dt / dx
    # backward difference for v > 0, forward for v < 0
    return f - c * (
        vp * (f - jnp.roll(f, 1, axis=0)) + vm * (jnp.roll(f, -1, axis=0) - f)
    )


def cfl_dt(v_max: float, dx: float, safety: float = 0.9) -> float:
    """Largest stable upwind time step for the advection substep."""
    return safety * dx / v_max


def make_inhomogeneous_step(
    cfg: CollisionConfig,
    collide_fn: Callable[[jnp.ndarray, Precomp], jnp.ndarray],
    *,
    dx: float,
    dt: float,
    knudsen: float = 1.0,
    vmap_cells: bool = True,
) -> Callable[[jnp.ndarray, Precomp], jnp.ndarray]:
    """Build one Strang-split step ``f -> f(t + dt)``.

    ``collide_fn(f, pre)`` evaluates Q for a single cell (``vmap_cells=True``,
    the plain operator from :func:`boltzfft.make_collision_operator` with
    ``jit=False``) or for the whole stacked cell axis at once
    (``vmap_cells=False`` — pass the ensemble-sharded operator from
    :func:`boltzfft.make_sharded_collision_operator`, whose shard_map already
    vmaps its local cells).

    Splitting: half-step advection, full-step collision (RK2 midpoint on
    ``Q/Kn``), half-step advection — second-order in the splitting error.
    """
    v_x = jnp.asarray(cfg.velocity_grid.v, cfg.real_dtype)
    inv_kn = 1.0 / knudsen

    if vmap_cells:
        q_of = jax.vmap(lambda f, pre: collide_fn(f, pre), in_axes=(0, None))
    else:
        q_of = collide_fn

    def step(f, pre):
        f = advect_upwind(f, v_x, dx, 0.5 * dt)
        # RK2 midpoint for the stiff-ish collision substep
        k1 = q_of(f, pre)
        f_mid = f + (0.5 * dt * inv_kn) * k1
        k2 = q_of(f_mid, pre)
        f = f + (dt * inv_kn) * k2
        f = advect_upwind(f, v_x, dx, 0.5 * dt)
        return f

    return step


def sod_initial_condition(
    cfg: CollisionConfig,
    nx: int,
    *,
    rho_left: float = 1.0,
    rho_right: float = 0.125,
    t_left: float = 1.0,
    t_right: float = 0.8,
) -> jnp.ndarray:
    """Sod-type Riemann initial data: two half-domains of Maxwellians with
    different density/temperature, zero bulk velocity.  Returns
    ``(nx, Nv, Nv, Nv)``."""
    from .bkw import maxwellian

    g = cfg.velocity_grid
    rsq = np.asarray(g.r_squared())
    m_left = np.asarray(maxwellian(rsq, density=rho_left, temperature=t_left))
    m_right = np.asarray(maxwellian(rsq, density=rho_right, temperature=t_right))
    f = np.where(
        (np.arange(nx) < nx // 2)[:, None, None, None], m_left[None], m_right[None]
    )
    return jnp.asarray(f, cfg.real_dtype)


def density_profile(f: jnp.ndarray, dv: float) -> jnp.ndarray:
    """Per-cell number density (mass moment)."""
    return jnp.sum(f, axis=(1, 2, 3)) * dv**3
