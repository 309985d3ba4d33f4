"""A/B the K-merged oz contraction (collide_ds oz_merge) on the TPU.

Chained in-graph timing (the only valid method through the tunnel) + the
on-device BKW Linf so the digit claim is checked in the same session:

    python benchmarks/probe_merge.py --nv 32 --k 8
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
from boltzfft import ds
from boltzfft.ds_operator import build_ds_precomp, collide_ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nv", type=int, default=32)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--modes", nargs="*", default=["off", "on"])
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass

    cfg = bz.CollisionConfig(nv=args.nv, ns=args.ns, impl="c2c",
                             dtype="float32")
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))
    engine = "oz" if jax.default_backend() == "tpu" else "vpu"
    k = args.k

    for mode in args.modes:
        mg = mode == "on"

        @jax.jit
        def chain(p, x, d, _mg=mg):
            def body(i, s):
                q = collide_ds(cfg, p, s, contract=engine, oz_merge=_mg)
                return ds.add(s, ds.mul_f(q, 1e-3))

            out = jax.lax.fori_loop(0, k, body, x)
            e = ds.sub(collide_ds(cfg, p, x, contract=engine, oz_merge=_mg), d)
            idx = jnp.argmax(jnp.abs(e.hi + e.lo))
            return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

        t0 = time.perf_counter()
        s, ehi, elo = chain(pre, f, dq)
        float(s)
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s, ehi, elo = chain(pre, f, dq)
            float(s)
            best = min(best, time.perf_counter() - t0)
        per = best / (k + 1)
        linf = abs(float(np.float64(float(ehi)) + np.float64(float(elo))))
        print(
            f"nv={args.nv} merge={mode}: {per*1e3:8.2f} ms/eval "
            f"{1.0/per:7.2f} evals/s  BKW Linf {linf:.4e} "
            f"(compile+first {cold:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
