"""cc-ladder probe for the fused ct io megakernel (round-4 ask #4, 96^3).

The auto rule (`pallas_kernels._ct_node_blocking`) bounds the inner matmul
sub-batch cc by a ~12-live-planes-per-node VMEM model at 44 MB, which forces
cc=1 at 96^3 and cc=2 at 64^3.  `CollisionConfig.fused_sub_batch` overrides
cc directly, so the ladder can be measured without kernel changes: does a
bigger cc compile under the real 100 MB scoped-vmem limit, and does it win?
cc must divide the radial group size gs = gcd(ns_eff, c) (6 at Ns=12
antipodal), so the ladder is {1, 2, 3, 6}.

Usage: python benchmarks/probe_ccx.py [--nv 96] [--ccs 1 2 3 6] [--k 8]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import boltzfft as bz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nv", type=int, default=96)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--ccs", type=int, nargs="*", default=[0, 2, 3, 6])
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import measure

    for cc in args.ccs:
        name = f"cc={cc or 'auto'}"
        try:
            cfg = bz.CollisionConfig(
                nv=args.nv, ns=args.ns, impl="fused", dtype="float32",
                fused_sub_batch=cc,
            )
            t0 = time.perf_counter()
            sec, linf = measure(cfg, k=args.k, trials=3)
            warm = time.perf_counter() - t0
            print(
                f"nv={args.nv} {name:8s}: {sec * 1e3:9.2f} ms/eval "
                f"{1.0 / sec:8.2f} evals/s  BKW Linf {linf:.4e} "
                f"(total {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"nv={args.nv} {name:8s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
