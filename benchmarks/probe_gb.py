"""One-off TPU probe: ds-oz half-path radial-group batching (group_batch).

Measures k-chained evals/s at --nv for each --gb value, plus BKW Linf,
using the bench.py methodology (chained inside one jit, D2H-synced).
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


def run(nv: int, gb, k: int) -> dict:
    cfg = bz.CollisionConfig(nv=nv, ns=12, impl="c2c", dtype="float32")
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))
    engine = "oz" if jax.default_backend() == "tpu" else "vpu"

    @jax.jit
    def chain(p, x, d):
        def body(i, s):
            q = collide_ds(cfg, p, s, contract=engine, group_batch=gb)
            return ds.add(s, ds.mul_f(q, 1e-3))

        out = jax.lax.fori_loop(0, k, body, x)
        e = ds.sub(
            collide_ds(cfg, p, x, contract=engine, group_batch=gb), d
        )
        idx = jnp.argmax(jnp.abs(e.hi + e.lo))
        return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

    s, ehi, elo = chain(pre, f, dq)
    float(s)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s, ehi, elo = chain(pre, f, dq)
        float(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (k + 1)
    linf = abs(float(np.float64(float(ehi)) + np.float64(float(elo))))
    return {"gb": gb, "evals_per_s": round(1.0 / per, 2), "linf": linf}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nv", type=int, default=32)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--gb", type=int, nargs="+", default=[1, 2, 4, 8])
    a = p.parse_args()
    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass
    for gb in a.gb:
        try:
            print(run(a.nv, gb, a.k), flush=True)
        except Exception as e:
            print({"gb": gb, "error": f"{type(e).__name__}: {e}"[:200]},
                  flush=True)
