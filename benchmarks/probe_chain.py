"""Separate per-eval device time from per-dispatch tunnel overhead.

measure()-style chained timing reports time/k = eval + RTT/k.  A 3 ms
"fixed" intercept at k=8 could be ~24 ms of dispatch RTT, not device work.
This probe uses a DYNAMIC chain length (lax.fori_loop with a traced bound:
one compile, any k) and fits time/k against 1/k to split the two.

Usage: python benchmarks/probe_chain.py [--nv 64] [--ks 4 8 16 32 64]
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
    ap.add_argument("--nv", type=int, default=64)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--impl", default="fused")
    ap.add_argument("--ds", action="store_true",
                    help="probe the ds-oz pipeline instead")
    ap.add_argument("--ks", type=int, nargs="*", default=[4, 8, 16, 32, 64])
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass

    if args.ds:
        from boltzfft import ds
        from boltzfft.ds_operator import build_ds_precomp, collide_ds

        cfg = bz.CollisionConfig(nv=args.nv, ns=args.ns, impl="c2c",
                                 dtype="float32")
        pre = build_ds_precomp(cfg)
        f0 = ds.from_f64(
            np.asarray(bz.bkw_f(cfg.velocity_grid.r_squared(), 6.5),
                       np.float64)
        )
        engine = "oz" if jax.default_backend() == "tpu" else "vpu"

        @jax.jit
        def chain(f, p, steps):
            body = lambda i, s: ds.add(
                s, ds.mul_f(collide_ds(cfg, p, s, contract=engine), 1e-3)
            )
            return jax.lax.fori_loop(0, steps, body, f)
    else:
        cfg = bz.CollisionConfig(nv=args.nv, ns=args.ns, impl=args.impl,
                                 dtype="float32")
        pre = bz.build_precomp(cfg)
        f0 = jnp.asarray(
            np.asarray(bz.bkw_f(cfg.velocity_grid.r_squared(), 6.5)),
            cfg.real_dtype,
        )

        @jax.jit
        def chain(f, p, steps):  # steps is TRACED: one compile for every k
            body = lambda i, x: x + 1e-3 * bz.collide(cfg, p, x)
            return jax.lax.fori_loop(0, steps, body, f)

    sync = lambda o: float(jnp.sum(jax.tree.leaves(o)[0]))
    sync(chain(f0, pre, jnp.int32(2)))  # compile + warm
    rows = []
    for k in args.ks:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(f0, pre, jnp.int32(k))
            sync(out)
            best = min(best, time.perf_counter() - t0)
        rows.append((k, best))
        print(f"k={k:3d}  total={best*1e3:8.2f} ms  per-eval={best/k*1e3:7.3f} ms"
              f"  ({k/best:7.1f} evals/s)", flush=True)

    ks = np.array([r[0] for r in rows], np.float64)
    ts = np.array([r[1] for r in rows], np.float64)
    # total = RTT + k*eval
    eval_ms, rtt_ms = np.polyfit(ks, ts, 1) * 1e3
    print(f"fit: total = {rtt_ms:.2f} ms dispatch + {eval_ms:.3f} ms/eval "
          f"(asymptotic {1e3/eval_ms:.1f} evals/s)")


if __name__ == "__main__":
    main()
