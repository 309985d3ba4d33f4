"""ds-oz above the reference's flagship sizes: 96^3/Ns=12 on hardware.

Round-4 verdict ask #8: one measured ds row above 64^3 showing the
f64-class accuracy story scales past the reference's largest BKW config
(the reference tops out at 64^3/Ns=32, `slurm_run_maxwell_bkw_fftw.sb`).
Method matches bench.py `_measure_ds` (k-chained Euler relaxation inside
one jit, timed around a D2H read; Linf measured in the same program).

    python benchmarks/ds96.py [--Nv 96] [--k 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import boltzfft as bz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Nv", type=int, default=96)
    ap.add_argument("--Ns", type=int, default=12)
    ap.add_argument("--k", type=int, default=3, help="chained evals")
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass

    from boltzfft import ds
    from boltzfft.ds_operator import build_ds_precomp, collide_ds

    cfg = bz.CollisionConfig(
        nv=args.Nv, ns=args.Ns, impl="c2c", dtype="float32"
    )
    t0 = time.perf_counter()
    pre = build_ds_precomp(cfg)
    print(f"precomp build+upload: {time.perf_counter() - t0:.1f}s",
          flush=True)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))
    engine = "oz" if jax.default_backend() == "tpu" else "vpu"
    k = args.k

    @jax.jit
    def chain(p, x, d):
        def body(i, s):
            return ds.add(
                s, ds.mul_f(collide_ds(cfg, p, s, contract=engine), 1e-3)
            )

        out = jax.lax.fori_loop(0, k, body, x)
        e = ds.sub(collide_ds(cfg, p, x, contract=engine), d)
        idx = jnp.argmax(jnp.abs(e.hi + e.lo))
        return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

    t0 = time.perf_counter()
    s, ehi, elo = chain(pre, f, dq)
    float(s)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(args.trials):
        t0 = time.perf_counter()
        s, ehi, elo = chain(pre, f, dq)
        float(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (k + 1)
    linf = abs(float(np.float64(float(ehi)) + np.float64(float(elo))))
    print(f"ds-{engine} {args.Nv}^3/Ns={args.Ns}: {per:.3f} s/eval = "
          f"{1.0 / per:.2f} evals/s, BKW Linf {linf:.4e} "
          f"(backend={jax.default_backend()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
