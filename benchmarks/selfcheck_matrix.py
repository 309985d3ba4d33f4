"""Per-round ON-HARDWARE correctness matrix (VERDICT round-3 ask #5).

The pytest suite runs the Pallas kernels in interpret mode on CPU, which is
NOT faithful for kernels whose math depends on exact f32 accumulation (the
Ozaki/ds kernels) or on the Mosaic lowering itself.  This script runs the
known-answer probes (`health.selfcheck`, `health.selfcheck_ds`) across the
impl/knob matrix ON THE REAL CHIP and appends a pass/fail + Linf table to
Results/ — the analog of the reference drivers' built-in oracle
(``maxwell_bkw_fftw.cpp:144-166``), run per round instead of per job.

    python benchmarks/selfcheck_matrix.py --tag r4 [--skip-flagship]

Exit status is nonzero if any row fails, so the driver can gate on it.
"""
from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import boltzfft as bz
from boltzfft import health


def f32_rows():
    """(name, kwargs for health.selfcheck) — analytic-BKW-oracle rows."""
    return [
        ("rfft-24", dict(nv=24, impl="rfft")),
        ("c2c-24", dict(nv=24, impl="c2c")),
        # dft at TPU-default precision: the dense-matmul bf16 fast path adds
        # ~1.3e-1 rel on this probe (measured r4) — calibrated loose tol
        # still catches O(1) breakage; the "highest" row pins f32-class math.
        ("dft-24-default", dict(nv=24, impl="dft", rel_tol=4e-1)),
        ("dft-24-highest", dict(nv=24, impl="dft",
                                cfg_kwargs={"fused_precision": "highest"})),
        ("fused-kron-24", dict(nv=24, impl="fused",
                               cfg_kwargs={"fused_scheme": "kron"})),
        ("fused-ct-32", dict(nv=32, impl="fused",
                             cfg_kwargs={"fused_scheme": "ct"})),
        ("fused-auto-32", dict(nv=32, impl="fused")),
        ("fused-highest-24", dict(nv=24, impl="fused",
                                  cfg_kwargs={"fused_precision": "highest"})),
        # No calibrated analytic bound on anisotropic grids (method error is
        # set by the smallest axis): cross-impl probe vs the staged rfft
        # pipeline on the same device instead.  Run the fused side at
        # "highest" so the comparison sits at f32-matmul class — at TPU
        # default precision the bf16 passes alone measure 5.8e-2 rel
        # (Results/selfcheck_matrix_r4.txt), swamping any real fault smaller
        # than O(1).  Breakage (wrong tables, bad ct radix split, Mosaic
        # miscompile) still lands at O(1) >> 2e-4.
        ("fused-aniso-16x24x32", dict(
            nv=16, impl="fused",
            cfg_kwargs={"nvy": 24, "nvz": 32, "fused_precision": "highest"},
            compare_impl="rfft", rel_tol=2e-4)),
    ]


def ds_rows():
    """(name, kwargs for health.selfcheck_ds) — oz-vs-vpu on-device rows."""
    return [
        ("ds-oz-default", dict()),
        ("ds-oz-full", dict(g_stream="full")),
        ("ds-oz-half-herm-on", dict(g_stream="half", herm_downstream=True)),
        ("ds-oz-half-herm-off", dict(g_stream="half", herm_downstream=False)),
        ("ds-oz-half-gb2", dict(g_stream="half", group_batch=2)),
        ("ds-oz-merge-off", dict(oz_merge=False)),
        ("ds-oz-merge-on", dict(oz_merge=True)),
        ("ds-oz-aniso-12x16x20", dict(
            nv=12, cfg_kwargs={"nvy": 16, "nvz": 20})),
        # round-4 knobs: fused g-main kernels (bit-exact vs staged on any
        # input) and the even-input-only g1 reversal (symmetrized probe)
        ("ds-oz-gmain3", dict(g_stream="half", gmain_fused="3")),
        ("ds-oz-gmain12", dict(g_stream="half", gmain_fused="12")),
        ("ds-oz-rev-even", dict(g_stream="half", g1_reversal=True,
                                symmetrize=True)),
        # the accuracy-midpoint dial: cmax=3 truncates slice pairs to the
        # ~1e-9 class by design, so the oz-vs-vpu probe needs a matching
        # tolerance; breakage (wrong retention masks) still lands at O(1).
        ("ds-oz-cmax3-midpoint", dict(oz_cmax=3, rel_tol=1e-6)),
    ]


def vhs_row():
    """VHS gamma=1 has no analytic oracle (BKW is Maxwell-molecules only):
    check fused against the staged rfft pipeline on device instead.  Fused
    side at "highest" for the same reason as the aniso row (default-precision
    bf16 passes measure 1.0e-1 rel on this probe, r4)."""
    return health.selfcheck(
        nv=24, impl="fused",
        cfg_kwargs={"gamma": 1.0, "fused_precision": "highest"},
        compare_impl="rfft", rel_tol=2e-4,  # f32 matmul class; breakage is O(1)
    )


def _ds_bkw_linf(nv: int) -> float:
    """On-device BKW Linf of the ds-oz pipeline at nv^3/Ns=12."""
    from boltzfft import ds
    from boltzfft.ds_operator import build_ds_precomp, collide_ds

    cfg = bz.CollisionConfig(nv=nv, ns=12, impl="c2c", dtype="float32")
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))

    @jax.jit
    def err(p, x, d):
        e = ds.sub(collide_ds(cfg, p, x, contract="oz"), d)
        idx = jnp.argmax(jnp.abs(e.hi + e.lo))
        return e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

    ehi, elo = err(pre, f, dq)
    return abs(float(np.float64(float(ehi)) + np.float64(float(elo))))


def flagship_row():
    """ds-oz 32^3/Ns=12 BKW digits — the reference's own printed Linf."""
    linf = _ds_bkw_linf(32)
    want = "4.2512e-05"
    return {"ok": f"{linf:.4e}" == want, "rel_linf": linf,
            "rel_tol": float(want)}


def flagship_row_64():
    """ds-oz 64^3/Ns=12 at the 1e-11 gate: the headline f64-class accuracy
    claim (Linf 3.0686e-12, the reference's 64^3 printed digits,
    `Results/maxwell_bkw_fftw_atomics.txt:197`) re-verified on hardware
    every round — round-4 verdict ask #5."""
    linf = _ds_bkw_linf(64)
    return {"ok": linf <= 1e-11, "rel_linf": linf, "rel_tol": 1e-11}


def flagship_fused_64():
    """fused 64^3/Ns=12 at its documented default-precision tolerance (BKW
    Linf 3.36e-4 captured in BENCH_r04 / docs/ACCURACY.md; gate at 1e-3 —
    breakage lands at O(1))."""
    cfg = bz.CollisionConfig(nv=64, ns=12, impl="fused", dtype="float32")
    _, pre = bz.make_collision_operator(cfg, jit=False)
    g = cfg.velocity_grid
    f = jnp.asarray(np.asarray(bz.bkw_f(g.r_squared(), 6.5)), cfg.real_dtype)
    dq = jnp.asarray(
        np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5)), cfg.real_dtype
    )

    @jax.jit
    def err(p, x, d):
        return jnp.max(jnp.abs(bz.collide(cfg, p, x) - d))

    linf = float(err(pre, f, dq))
    return {"ok": linf <= 1e-3, "rel_linf": linf, "rel_tol": 1e-3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="adhoc",
                    help="suffix for the Results log (e.g. r4)")
    ap.add_argument("--skip-flagship", action="store_true",
                    help="skip the 32^3 ds digit row (heaviest compile)")
    ap.add_argument("--skip-64", action="store_true",
                    help="skip the 64^3 flagship rows (ds-oz at the 1e-11 "
                         "gate + fused at its documented f32 tolerance; "
                         "minutes of compile+run each)")
    args = ap.parse_args()

    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass

    lines = [
        f"# boltzfft on-hardware selfcheck matrix — "
        f"{datetime.date.today().isoformat()} "
        f"backend={jax.default_backend()} device={jax.devices()[0]}",
        f"# {'row':26s} {'ok':>4s} {'rel_linf':>12s} {'tol':>9s} "
        f"{'secs':>7s}",
    ]
    n_fail = 0

    def record(name, res, secs):
        nonlocal n_fail
        ok = bool(res["ok"])
        n_fail += 0 if ok else 1
        line = (
            f"{name:28s} {'PASS' if ok else 'FAIL':>4s} "
            f"{res['rel_linf']:12.4e} {res['rel_tol']:9.1e} {secs:7.1f}"
        )
        lines.append(line)
        print(line, flush=True)

    for name, kw in f32_rows():
        t0 = time.perf_counter()
        try:
            res = health.selfcheck(**kw)
        except Exception as e:
            res = {"ok": False, "rel_linf": float("nan"), "rel_tol": 0.0}
            lines.append(f"# {name} raised: {type(e).__name__}: {e}"[:160])
        record(name, res, time.perf_counter() - t0)

    t0 = time.perf_counter()
    try:
        res = vhs_row()
    except Exception as e:
        res = {"ok": False, "rel_linf": float("nan"), "rel_tol": 0.0}
        lines.append(f"# vhs-gamma1 raised: {type(e).__name__}: {e}"[:160])
    record("vhs-gamma1-rfft-vs-fused", res, time.perf_counter() - t0)

    for name, kw in ds_rows():
        t0 = time.perf_counter()
        try:
            res = health.selfcheck_ds(**kw)
        except Exception as e:
            res = {"ok": False, "rel_linf": float("nan"), "rel_tol": 0.0}
            lines.append(f"# {name} raised: {type(e).__name__}: {e}"[:160])
        record(name, res, time.perf_counter() - t0)

    if not args.skip_flagship:
        t0 = time.perf_counter()
        try:
            res = flagship_row()
        except Exception as e:
            res = {"ok": False, "rel_linf": float("nan"), "rel_tol": 0.0}
            lines.append(
                f"# ds-oz-32-digits raised: {type(e).__name__}: {e}"[:160]
            )
        record("ds-oz-32-bkw-digits", res, time.perf_counter() - t0)

    if not args.skip_64:
        for name, fn in (
            ("ds-oz-64-1e-11", flagship_row_64),
            ("fused-64-default-f32", flagship_fused_64),
        ):
            t0 = time.perf_counter()
            try:
                res = fn()
            except Exception as e:
                res = {"ok": False, "rel_linf": float("nan"), "rel_tol": 0.0}
                lines.append(f"# {name} raised: {type(e).__name__}: {e}"[:160])
            record(name, res, time.perf_counter() - t0)

    out = Path(__file__).resolve().parent.parent / "Results" / (
        f"selfcheck_matrix_{args.tag}.txt"
    )
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({n_fail} failures)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
