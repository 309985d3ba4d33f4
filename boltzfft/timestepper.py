"""Explicit time integration of the space-homogeneous Boltzmann equation.

``df/dt = Q(f, f)`` — the BASELINE north-star extends the reference's
single-eval driver (``maxwell_bkw_fftw.cpp`` has no time loop) to a jitted
relaxation loop with on-device moments.  Steppers are classic explicit RK
schemes expressed as pure functions; the relaxation loop is a ``lax.scan`` so
the whole trajectory compiles into one XLA program with no host round-trips.

The steppers are generic over the state algebra: plain arrays use hardware
arithmetic, and :class:`boltzfft.ds.DS` states (the compensated pipeline)
use double-single add/scale — so a whole relaxation can run at f64-class
accuracy on an f32-only accelerator.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ds as _ds

RHS = Callable[[jnp.ndarray], jnp.ndarray]


def _axpy(f, a: float, k):
    """``f + a * k`` in the state's own arithmetic."""
    if isinstance(f, _ds.DS):
        # the scalar must be split too: fl32(dt/6) alone costs 2^-24 relative
        # per stage, swamping the ds state's 2^-48
        return _ds.add(f, _ds.mul(k, _ds.from_f64(np.float64(a), k.hi.dtype)))
    return f + a * k


def euler_step(rhs: RHS, f, dt: float):
    return _axpy(f, dt, rhs(f))


def rk2_step(rhs: RHS, f, dt: float):
    """Midpoint (SSP-friendly 2nd order) step."""
    k1 = rhs(f)
    return _axpy(f, dt, rhs(_axpy(f, 0.5 * dt, k1)))


def rk4_step(rhs: RHS, f, dt: float):
    """Classic 4th-order Runge-Kutta step."""
    k1 = rhs(f)
    k2 = rhs(_axpy(f, 0.5 * dt, k1))
    k3 = rhs(_axpy(f, 0.5 * dt, k2))
    k4 = rhs(_axpy(f, dt, k3))
    if isinstance(f, _ds.DS):
        out = _axpy(f, dt / 6.0, k1)
        out = _axpy(out, dt / 3.0, k2)
        out = _axpy(out, dt / 3.0, k3)
        return _axpy(out, dt / 6.0, k4)
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
