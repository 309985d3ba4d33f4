"""Benchmark sweep runner — the analog of the reference's SLURM sweep scripts
(``slurm_run_maxwell_bkw_fftw.sb`` sweeping threads x Nv x Ns), producing
Results/-style logs.

Where the reference sweeps OpenMP thread counts, the TPU sweep dimensions are
grid size, quadrature order, implementation, and (on multi-chip systems) mesh
shape.  Usage:

    python benchmarks/run_sweep.py --out Results/boltzfft_sweep.txt \
        --Nv 16 32 --Ns 6 12 --impl rfft dft --trials 5
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def measure(cfg, k, trials):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import boltzfft as bz

    pre = bz.build_precomp(cfg)
    f0 = jnp.asarray(
        np.asarray(bz.bkw_f(cfg.velocity_grid.r_squared(), 6.5)), cfg.real_dtype
    )

    @partial(jax.jit, static_argnums=2)
    def chain(f, p, steps):
        return jax.lax.fori_loop(
            0, steps, lambda i, x: x + 1e-3 * bz.collide(cfg, p, x), f
        )

    out = chain(f0, pre, k)
    float(jnp.sum(out))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = chain(f0, pre, k)
        float(jnp.sum(out))
        times.append((time.perf_counter() - t0) / k)
    return bz.RunStats.from_times(times)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--Nv", type=int, nargs="+", default=[32])
    p.add_argument("--Ns", type=int, nargs="+", default=[12])
    p.add_argument("--impl", nargs="+", default=["rfft"])
    p.add_argument("--dtype", default=None)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--out", default=None, help="append results to this log file")
    args = p.parse_args(argv)

    import jax

    import boltzfft as bz
    from boltzfft.cli import default_dtype

    dtype = args.dtype or default_dtype()
    lines = [
        f"# boltzfft sweep on {jax.devices()[0].device_kind} "
        f"({jax.default_backend()}), dtype={dtype}, chain={args.chain}, "
        f"trials={args.trials}"
    ]
    for nv in args.Nv:
        for ns in args.Ns:
            for impl in args.impl:
                cfg = bz.CollisionConfig(nv=nv, ns=ns, impl=impl, dtype=dtype)
                stats = measure(cfg, args.chain, args.trials)
                line = (
                    f"Nv={nv} Ns={ns} impl={impl}: mean={stats.mean:.4e} s/eval "
                    f"min={stats.minimum:.4e} max={stats.maximum:.4e} "
                    f"stdev={stats.stdev:.4e} -> {1.0/stats.mean:.1f} evals/s"
                )
                print(line, flush=True)
                lines.append(line)

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with out.open("a") as fh:
            fh.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
