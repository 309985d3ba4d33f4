"""One-off TPU probe: bigger row blocks (rb) for the oz contraction kernels.

Monkeypatches oz._row_block to try --rb wherever rows divide, then times
the full ds-oz eval at --nv (bench.py chained methodology).  The default
cap is 512 (the (sx*rb, sm*L) product array's VMEM bound at ~7.3 MB);
this measures whether deeper blocks help the half path's z-half /
forward stages (ROADMAP lever c).
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
from boltzfft import ds, oz
from boltzfft.ds_operator import build_ds_precomp, collide_ds

_orig_row_block = oz._row_block


def run(nv: int, rb: int, k: int) -> dict:
    if rb != 512:
        def patched(rows: int) -> int:
            if rows % rb == 0:
                return rb
            return _orig_row_block(rows)

        oz._row_block = patched
    else:
        oz._row_block = _orig_row_block
    cfg = bz.CollisionConfig(nv=nv, ns=12, impl="c2c", dtype="float32")
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))

    @jax.jit
    def chain(p, x, d):
        def body(i, s):
            q = collide_ds(cfg, p, s, contract="oz")
            return ds.add(s, ds.mul_f(q, 1e-3))

        out = jax.lax.fori_loop(0, k, body, x)
        e = ds.sub(collide_ds(cfg, p, x, contract="oz"), d)
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
    return {"rb": rb, "evals_per_s": round(1.0 / per, 2), "linf": linf}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nv", type=int, default=64)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--rb", type=int, nargs="+", default=[1024])
    a = p.parse_args()
    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass
    for rb in a.rb:
        try:
            print(run(a.nv, rb, a.k), flush=True)
        except Exception as e:
            print({"rb": rb, "error": f"{type(e).__name__}: {e}"[:300]},
                  flush=True)
