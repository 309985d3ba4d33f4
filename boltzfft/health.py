"""Known-answer self-check — lightweight failure detection.

The reference's failure handling is exit-on-error macros
(``CUDABoltzmannOperator.hpp:20-38``); a production TPU deployment instead
wants a cheap runtime probe that the device computes *correct* results (not
just that kernels launch): evaluate the collision operator on a small BKW
problem and compare against the analytic oracle ``bkw_dfdt``
(``maxwell_bkw_fftw.cpp:94-96``), exactly like the reference drivers validate
themselves — but as a callable probe with a pass/fail verdict.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

# Calibrated relative-Linf thresholds (max|Q - Q_bkw| / max|Q_bkw|) for the
# probe config nv=24, ns=6, n_radial=12, t=6.5.  Measured method error there
# is 4.12e-2 (f64, CPU); f32 roundoff and the fused kernel's fast-path matmul
# precision sit orders of magnitude below it, so one threshold (3x measured)
# covers every backend/impl.  A wrong-but-bounded Q — e.g. a mis-scaled loss
# term — lands at O(1) relative error and fails decisively (tested).
_REL_TOL = 0.12
_PROBE_TIME = 6.5


def selfcheck(
    nv: int = 24,
    ns: int = 6,
    n_radial: Optional[int] = None,
    dtype: Optional[str] = None,
    impl: Optional[str] = None,
    rel_tol: float = _REL_TOL,
    pre_transform: Optional[Callable] = None,
) -> dict:
    """Run a small end-to-end collision eval and compare against the analytic
    BKW oracle.

    Returns a dict with ``ok`` (bool), the achieved relative Linf deviation,
    timing, and backend info.  Cheap enough to run at job start or after
    suspected device faults.  ``impl`` defaults to the flagship ``"fused"``
    megakernel on TPU (the path production runs take) and ``"rfft"``
    elsewhere.  ``pre_transform`` is a fault-injection hook: it receives the
    ``Precomp`` pytree before the eval (used by tests to verify that corrupted
    weights are detected).
    """
    import jax
    import jax.numpy as jnp

    import boltzfft as bz

    if dtype is None:
        dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    if impl is None:
        impl = "fused" if jax.default_backend() == "tpu" else "rfft"

    cfg = bz.CollisionConfig(
        nv=nv, ns=ns, n_radial=n_radial if n_radial is not None else nv // 2,
        dtype=dtype, impl=impl,
    )
    collide, pre = bz.make_collision_operator(cfg)
    if pre_transform is not None:
        pre = pre_transform(pre)
    g = cfg.velocity_grid
    rsq = g.r_squared()
    f = jnp.asarray(np.asarray(bz.bkw_f(rsq, _PROBE_TIME)), cfg.real_dtype)
    q_exact = jnp.asarray(
        np.asarray(bz.bkw_dfdt(rsq, _PROBE_TIME)), cfg.real_dtype
    )

    t0 = time.perf_counter()
    q = collide(f, pre)
    # reduce on device; fetch only scalars (large/complex D2H can be
    # unsupported on tunneled TPU runtimes)
    q_max = float(jnp.max(jnp.abs(q_exact)))
    rel_linf = float(jnp.max(jnp.abs(q - q_exact))) / q_max
    q_mass = float(jnp.sum(q)) * g.dv**3
    finite = bool(jnp.all(jnp.isfinite(q)))
    elapsed = time.perf_counter() - t0

    ok = finite and rel_linf < rel_tol
    return {
        "ok": ok,
        "finite": finite,
        "rel_linf": rel_linf,
        "rel_tol": rel_tol,
        "q_mass": q_mass,
        "elapsed_s": elapsed,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": {"nv": nv, "ns": ns, "dtype": dtype, "impl": impl},
    }
