"""A/B the half-spectrum ds-oz g-stream against the full complex streams.

Chained-eval harness (the only valid timing through the remote-TPU tunnel,
see docs/PERFORMANCE.md) + on-device BKW error check, for each
``g_stream`` mode:

    python benchmarks/ab_half.py --nv 64 --ns 12 --modes full,half
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import boltzfft as bz
from boltzfft import ds
from boltzfft.ds_operator import build_ds_precomp, collide_ds


def measure(cfg, pre, f, dq, g_stream, k, sub_batch=2, trials=3):
    engine = "oz" if jax.default_backend() == "tpu" else "ozk"

    @jax.jit
    def chain(p, x, d):
        def body(i, s):
            q = collide_ds(cfg, p, s, contract=engine,
                           g_stream=g_stream, sub_batch=sub_batch)
            return ds.add(s, ds.mul_f(q, 1e-3))

        out = jax.lax.fori_loop(0, k, body, x)
        e = ds.sub(
            collide_ds(cfg, p, x, contract=engine, g_stream=g_stream,
                       sub_batch=sub_batch), d
        )
        idx = jnp.argmax(jnp.abs(e.hi + e.lo))
        return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

    t0 = time.perf_counter()
    s, ehi, elo = chain(pre, f, dq)
    float(s)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s, ehi, elo = chain(pre, f, dq)
        float(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (k + 1)
    linf = abs(float(np.float64(float(ehi)) + np.float64(float(elo))))
    return per, linf, compile_s


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nv", type=int, default=64)
    p.add_argument("--ns", type=int, default=12)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--modes", default="full,half")
    p.add_argument("--sub-batch", type=int, default=2)
    args = p.parse_args(argv)
    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass
    cfg = bz.CollisionConfig(
        nv=args.nv, ns=args.ns, impl="c2c", dtype="float32"
    )
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))
    print(f"backend: {jax.default_backend()}  {args.nv}^3 Ns={args.ns}")
    for mode in args.modes.split(","):
        per, linf, cs = measure(cfg, pre, f, dq, mode, args.k,
                                 sub_batch=args.sub_batch)
        print(
            f"g_stream={mode:5s}  {per*1e3:8.1f} ms/eval  "
            f"{1.0/per:6.2f} evals/s  BKW Linf {linf:.4e}  "
            f"(compile+first {cs:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
