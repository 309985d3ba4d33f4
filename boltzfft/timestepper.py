"""Explicit time integration of the space-homogeneous Boltzmann equation.

``df/dt = Q(f, f)`` — the BASELINE north-star extends the reference's
single-eval driver (``maxwell_bkw_fftw.cpp`` has no time loop) to a jitted
relaxation loop with on-device moments.  Steppers are classic explicit RK
schemes expressed as pure functions; the relaxation loop is a ``lax.scan`` so
the whole trajectory compiles into one XLA program with no host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

RHS = Callable[[jnp.ndarray], jnp.ndarray]


def euler_step(rhs: RHS, f: jnp.ndarray, dt: float) -> jnp.ndarray:
    return f + dt * rhs(f)


def rk2_step(rhs: RHS, f: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Midpoint (SSP-friendly 2nd order) step."""
    k1 = rhs(f)
    return f + dt * rhs(f + 0.5 * dt * k1)


def rk4_step(rhs: RHS, f: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Classic 4th-order Runge-Kutta step."""
    k1 = rhs(f)
    k2 = rhs(f + 0.5 * dt * k1)
    k3 = rhs(f + 0.5 * dt * k2)
    k4 = rhs(f + dt * k3)
    return f + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPPERS = {"euler": euler_step, "rk2": rk2_step, "rk4": rk4_step}


class Trajectory(NamedTuple):
    f: jnp.ndarray  # final state
    recorded: Optional[jnp.ndarray]  # stacked per-step records (or None)


def relax(
    rhs: RHS,
    f0: jnp.ndarray,
    dt: float,
    n_steps: int,
    method: str = "rk4",
    record: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Trajectory:
    """Integrate ``df/dt = rhs(f)`` for ``n_steps`` of size ``dt``.

    ``record(f)`` (e.g. a moments closure) is evaluated after every step and
    stacked along a leading time axis.  Jittable end to end; under jit the
    whole loop is one ``lax.scan``.
    """
    if method not in _STEPPERS:
        raise ValueError(f"method must be one of {sorted(_STEPPERS)}, got {method!r}")
    step = _STEPPERS[method]

    def body(f, _):
        f_next = step(rhs, f, dt)
        out = record(f_next) if record is not None else None
        return f_next, out

    f_final, recs = jax.lax.scan(body, f0, None, length=n_steps)
    return Trajectory(f=f_final, recorded=recs)


def make_relaxation(
    collide_fn: Callable,
    pre,
    dt: float,
    n_steps: int,
    method: str = "rk4",
    record: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Callable[[jnp.ndarray], Trajectory]:
    """Bind a collision operator into a jitted relaxation loop ``f0 -> Trajectory``."""
    rhs = lambda f: collide_fn(f, pre)

    def run(f0):
        return relax(rhs, f0, dt, n_steps, method=method, record=record)

    return jax.jit(run)
