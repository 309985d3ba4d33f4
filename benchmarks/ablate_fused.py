"""Stage-level ablation of the fused io megakernel: fixed vs per-node cost.

The round-3 arithmetic says 64^3 went 11.17 -> 7.59 ms/eval when the
antipodal reduction halved the node batch — implying ~4 ms of per-eval cost
that does NOT scale with nodes.  The in-kernel fixed stages (forward of f,
beta2 loss, final inverses) are ~3 single-field transforms = trivial FLOPs,
so if the intercept really is ~4 ms it is overhead, not math.  This probe
measures eval time as a function of the radial node count (``n_radial`` is a
public config knob; B = n_gl * ns_eff) and fits time = fixed + slope * B.

Timing follows the tunnel rules (.claude/skills/verify/SKILL.md): k evals
chained inside ONE jit, synced by a device-to-host read.

Usage:  python benchmarks/ablate_fused.py [--nv 64] [--k 8]
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import boltzfft as bz


def measure(cfg, k, trials=3):
    pre = bz.build_precomp(cfg)
    f0 = jnp.asarray(
        np.asarray(bz.bkw_f(cfg.velocity_grid.r_squared(), 6.5)), cfg.real_dtype
    )

    @partial(jax.jit, static_argnums=2)
    def chain(f, p, steps):
        body = lambda i, x: x + 1e-3 * bz.collide(cfg, p, x)
        return jax.lax.fori_loop(0, steps, body, f)

    out = chain(f0, pre, k)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = chain(f0, pre, k)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nv", type=int, default=64)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--radials", type=int, nargs="*", default=None)
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass

    radials = args.radials or [args.nv // 4, args.nv // 2, args.nv]
    rows = []
    for nr in radials:
        cfg = bz.CollisionConfig(
            nv=args.nv, ns=args.ns, n_radial=nr, impl="fused", dtype="float32"
        )
        sec = measure(cfg, args.k)
        b = cfg.n_gl * cfg.ns_eff
        rows.append((nr, b, sec))
        print(f"n_radial={nr:3d}  B={b:4d}  {sec*1e3:8.3f} ms/eval  "
              f"{1/sec:7.1f} evals/s", flush=True)

    if len(rows) >= 2:
        bs = np.array([r[1] for r in rows], np.float64)
        ts = np.array([r[2] for r in rows], np.float64)
        slope, fixed = np.polyfit(bs, ts, 1)
        print(f"fit: time = {fixed*1e3:.3f} ms fixed + {slope*1e6:.2f} us/node"
              f"  (at B={bs[-1]:.0f}: fixed is "
              f"{100*fixed/(fixed+slope*bs[-1]):.0f}% of the eval)")


if __name__ == "__main__":
    main()
