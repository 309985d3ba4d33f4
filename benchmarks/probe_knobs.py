"""Probe collide_ds knob settings on the TPU with chained in-graph timing.

Each named config is one jitted k-chain (the only valid timing through the
tunnel) plus the on-device BKW Linf, so every speed row carries its accuracy.

    python benchmarks/probe_knobs.py --nv 64 --k 8 --configs base sb3 gb2

Config names: base, sb1, sb3, sb6, gb2, gb4, herm, cmax5, cmax4, cmax3,
cmax2 (combine by running several).
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

CONFIGS = {
    "base": {},
    "sb1": {"sub_batch": 1},
    "sb3": {"sub_batch": 3},
    "sb6": {"sub_batch": 6},
    "gb2": {"group_batch": 2},
    "gb4": {"group_batch": 4},
    "herm": {"herm_downstream": True},
    "cmax5": {"oz_cmax": 5},
    "cmax4": {"oz_cmax": 4},
    "cmax3": {"oz_cmax": 3},
    "cmax2": {"oz_cmax": 2},
    "gm3": {"gmain_fused": "3"},
    "gm12": {"gmain_fused": "12"},
    "gm3off": {"gmain_fused": False},
    "gm3gb2": {"gmain_fused": True, "group_batch": 2},
    # rev: even-symmetry stream reuse — valid ONLY for centrally-symmetric
    # f (the BKW bench state is); see collide_ds g1_reversal
    "rev": {"g1_reversal": True},
    "revst": {"g1_reversal": True, "gmain_fused": False},
    "revgb2": {"g1_reversal": True, "gmain_fused": False, "group_batch": 2},
    "sb4": {"sub_batch": 4},
    "sb4gm3": {"sub_batch": 4, "gmain_fused": "3"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nv", type=int, default=64)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--configs", nargs="*", default=["base", "sb3", "gb2"])
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

    for name in args.configs:
        kw = CONFIGS[name]

        @jax.jit
        def chain(p, x, d, _kw=kw):
            def body(i, s):
                q = collide_ds(cfg, p, s, contract=engine, **_kw)
                return ds.add(s, ds.mul_f(q, 1e-3))

            out = jax.lax.fori_loop(0, k, body, x)
            e = ds.sub(collide_ds(cfg, p, x, contract=engine, **_kw), d)
            idx = jnp.argmax(jnp.abs(e.hi + e.lo))
            return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

        try:
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
                f"nv={args.nv} {name:6s}: {per*1e3:8.2f} ms/eval "
                f"{1.0/per:7.2f} evals/s  BKW Linf {linf:.4e} "
                f"(compile+first {cold:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"nv={args.nv} {name:6s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
