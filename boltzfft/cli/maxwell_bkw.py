"""BKW accuracy + performance driver — the main entry point.

TPU-native rebuild of ``maxwell_bkw_fftw.cpp`` / ``maxwell_bkw_cuda.cu``:
builds the BKW distribution for Maxwell molecules, evaluates the collision
operator over timed trials, and reports run statistics plus L1/L2/Linf errors
against the analytic ``df/dt`` in the reference's output format.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None):
    from boltzfft.cli import default_dtype, standard_parser

    args = standard_parser(__doc__).parse_args(argv)

    import jax.numpy as jnp

    import boltzfft as bz

    dtype = args.dtype or default_dtype()
    print("\nRun arguments:")
    print(f"Nv = {args.Nv}")
    print(f"Ns = {args.Ns}")
    print(f"trials = {args.trials}")
    print(f"dtype = {dtype}, impl = {args.impl}")

    # Maxwell molecules (maxwell_bkw_fftw.cpp:54-55); t = 6.5 (:74)
    cfg = bz.CollisionConfig(
        nv=args.Nv, ns=args.Ns, impl=args.impl, dtype=dtype,
        node_chunk=args.node_chunk,
    )
    g = cfg.velocity_grid
    rsq = g.r_squared()
    f_bkw = np.asarray(bz.bkw_f(rsq, 6.5))
    q_bkw = np.asarray(bz.bkw_dfdt(rsq, 6.5))

    t0 = time.perf_counter()
    collide, pre = bz.make_collision_operator(cfg)
    f_dev = jnp.asarray(f_bkw, cfg.real_dtype)
    q = np.asarray(collide(f_dev, pre))  # compile + first eval
    init_time = time.perf_counter() - t0
    print(f"Initialization time (s): {init_time:.6g} seconds")

    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        q = collide(f_dev, pre)
        q = np.asarray(q)  # device-to-host read = synchronization
        times.append(time.perf_counter() - t0)
    print(bz.RunStats.from_times(times).summary(f"boltzfft/{args.impl}"))

    err = bz.error_norms(q, q_bkw, g.dv)
    print("Approximation errors:")
    print(f"L1 error: {err['L1']:.6g}")
    print(f"L2 error: {err['L2']:.6g}")
    print(f"Linf error: {err['Linf']:.6g}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
