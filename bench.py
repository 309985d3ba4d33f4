"""Headline benchmark: collision-operator evaluations/second on TPU.

Config matches the reference's flagship run (``maxwell_bkw_fftw_ex --Nv 32
--Ns 12``); baseline is the reference's best checked-in number — 1.9085e-02 s
per eval on a 128-thread Perlmutter CPU node
(``Results/maxwell_bkw_fftw_atomics.txt:167``) = 52.40 evals/s.

Methodology: k collision evals chained as an Euler relaxation inside one jit
(each step's input depends on the previous step's output), timed around a
device-to-host read of the result.  This measures sustained device throughput
— per-call dispatch through the remote-TPU tunnel costs ~30 ms and
``block_until_ready`` does not synchronize it, so naive per-call timing is
meaningless here.  Chain lengths are sized so the one-per-chain dispatch
RTT (~37-45 ms measured, ``benchmarks/probe_chain.py`` round 4) is <10% of
the chain: production use IS a long chained relaxation (``timestepper.relax``
/ the RK loops), so the sustained rate is the deployment-relevant number.
The fori_loop bound stays STATIC (as in ``lax.scan``) — measured round 4:
a traced dynamic bound costs ~2x per eval at 64^3 on identical (bitwise)
results because XLA schedules the known-trip-count loop far better.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import boltzfft as bz

BASELINE_EVALS_PER_S = 1.0 / 1.9085e-02  # reference, Nv=32 Ns=12, 128-thread CPU


def measure(cfg: bz.CollisionConfig, k: int = 32, trials: int = 3):
    """Best-of-``trials`` ``(seconds per collision eval, BKW Linf)``,
    k-chained.  The Linf (same convention as the reference drivers' error
    block, ``maxwell_bkw_fftw.cpp:144-166``) rides in the same jit so every
    speed row carries the accuracy of the pipeline it timed."""
    pre = bz.build_precomp(cfg)
    g = cfg.velocity_grid
    f0 = jnp.asarray(
        np.asarray(bz.bkw_f(g.r_squared(), 6.5)), cfg.real_dtype
    )
    dq = jnp.asarray(
        np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5)), cfg.real_dtype
    )

    @partial(jax.jit, static_argnums=3)
    def chain(f, p, d, steps):
        body = lambda i, x: x + 1e-3 * bz.collide(cfg, p, x)
        out = jax.lax.fori_loop(0, steps, body, f)
        err = jnp.max(jnp.abs(bz.collide(cfg, p, f) - d))
        return jnp.sum(out), err

    s, err = chain(f0, pre, dq, k)
    float(s)  # warm: compile + first run, synced via D2H
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s, err = chain(f0, pre, dq, k)
        float(s)  # D2H read = real synchronization
        best = min(best, time.perf_counter() - t0)
    return best / (k + 1), float(err)


BASELINE_EVALS_PER_S_64 = 1.0 / 4.9432e-01  # reference, Nv=64 Ns=12, 128-thread CPU


def _measure_with_fallback(nv: int, ns: int, k: int):
    """Measure the fused flagship; on failure fall back to the staged rfft
    pipeline — and *say so* (metric numbers must name the impl that ran)."""
    try:
        cfg = bz.CollisionConfig(nv=nv, ns=ns, impl="fused", dtype="float32")
        sec, linf = measure(cfg, k=k)
        return sec, linf, "fused", None
    except Exception as e:
        reason = f"fused failed: {type(e).__name__}: {e}"[:200]
        cfg = bz.CollisionConfig(nv=nv, ns=ns, impl="rfft", dtype="float32")
        sec, linf = measure(cfg, k=k)
        return sec, linf, "rfft", reason


def main():
    # Watchdog: a wedged device/tunnel must produce a fast honest failure,
    # not a hung driver (the remote-TPU relay can stall for tens of minutes
    # after a runtime fault).
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("benchmark watchdog expired")

    signal.signal(signal.SIGALRM, _timeout)
    # Budget covers a fully cold run (the 64^3 ds-oz program alone compiles
    # ~9 min); the persistent compilation cache (FFTW-wisdom analog) makes
    # warm reruns fast.  Each metric below has its own try/except, so an
    # expired watchdog truncates the slowest metric, not the whole line.
    signal.alarm(2400)
    try:
        bz.enable_compilation_cache("/root/repo/.xla_cache")
    except Exception:
        pass
    result = {
        "metric": "collision_evals_per_sec_nv32_ns12_f32",
        "value": 0,
        "unit": "evals/s",
        "vs_baseline": 0,
    }
    try:
        sec, linf32, impl, fb = _measure_with_fallback(32, 12, k=128)
        evals_per_s = 1.0 / sec
        result.update(
            value=round(evals_per_s, 2),
            vs_baseline=round(evals_per_s / BASELINE_EVALS_PER_S, 3),
            impl=impl,
            bkw_linf=float(f"{linf32:.4e}"),
        )
        if fb:
            result["fallback_reason"] = fb
        # second tracked config: the big grid (where the MXU roofline target
        # lives); reported inside the same JSON line
        try:
            sec64, linf64, impl64, fb64 = _measure_with_fallback(64, 12, k=64)
            e64 = 1.0 / sec64
            result["nv64_ns12_f32"] = {
                "value": round(e64, 2),
                "vs_baseline": round(e64 / BASELINE_EVALS_PER_S_64, 3),
                "impl": impl64,
                "bkw_linf": float(f"{linf64:.4e}"),
                **({"fallback_reason": fb64} if fb64 else {}),
            }
        except Exception as e:
            result["nv64_ns12_f32"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        # third tracked config: the compensated (double-single) pipeline via
        # the Ozaki MXU contraction — f64-class digits on f32 hardware
        # (boltzfft/oz.py); reports its measured BKW error alongside speed
        try:
            result["ds_oz_nv32_ns12"] = _measure_ds(32, 12, k=32)
        except Exception as e:
            result["ds_oz_nv32_ns12"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        # fourth tracked config: ds-oz at 64^3 — the accuracy axis the
        # reference's flagship result lives on (f64 CPU node: 2.02 evals/s at
        # Linf 3.07e-12, BASELINE.md:18).  vs_baseline > 1 here means the TPU
        # beats the reference at the reference's own accuracy.
        try:
            r64 = _measure_ds(64, 12, k=12)
            r64["vs_baseline"] = round(r64["value"] * 4.9432e-01, 3)
            result["ds_oz_nv64_ns12"] = r64
        except Exception as e:
            result["ds_oz_nv64_ns12"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        # fifth tracked config: ds-oz 64^3 with the opt-in g1 reversal — the
        # relaxation-benchmark state is centrally symmetric (f(v) = f(-v)),
        # and the reversal halves the dominant per-node transform work
        # EXACTLY on that input class (collide_ds g1_reversal).  Labeled:
        # this row's claim is restricted to even inputs; the general-input
        # number is the row above.
        try:
            r64r = _measure_ds(64, 12, k=16, g1_reversal=True,
                               gmain_fused=False)
            r64r["vs_baseline"] = round(r64r["value"] * 4.9432e-01, 3)
            r64r["input_class"] = "centrally_symmetric"
            result["ds_oz_nv64_ns12_rev"] = r64r
        except Exception as e:
            result["ds_oz_nv64_ns12_rev"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        # sixth tracked config: the accuracy MIDPOINT — cfg.oz_cmax=4 keeps
        # ~2e-11 Linf at general input, filling the frontier hole between
        # the fast f32 fused pipeline (~1e-8) and the digit-exact ds default
        # (3.07e-12).  The measured ladder (docs/PERFORMANCE.md "accuracy
        # midpoint") shows cmax=4 is the Pareto point: cmax=3 buys only 8%
        # more speed for 100x the error, cmax=2 is dominated outright by
        # fused_precision="highest".
        try:
            r64m = _measure_ds(64, 12, k=16, oz_cmax=4)
            r64m["vs_baseline"] = round(r64m["value"] * 4.9432e-01, 3)
            r64m["accuracy_class"] = "midpoint_2e-11"
            result["ds_oz_nv64_ns12_cmax4"] = r64m
        except Exception as e:
            result["ds_oz_nv64_ns12_cmax4"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        # seventh tracked config: batched independent evals at the
        # flagship size.  The REFERENCE's own trials are repeated
        # INDEPENDENT evals of the same input (maxwell_bkw_fftw.cpp:
        # 133-140, no chaining), so aggregate throughput over independent
        # distributions is the closer-to-reference semantic; the chained
        # headline above is the stricter latency-style bound.  vmap of
        # the megakernel is bitwise-identical to per-call (measured).
        # At 32^3 batching hides the inter-launch gaps the chain pays
        # (1.58x); at 64^3 the longer kernel already hides them (+5%).
        try:
            result["fused_nv32_ns12_batch8"] = _measure_fused_batch(
                32, 12, e=8, k=64
            )
        except Exception as e:
            result["fused_nv32_ns12_batch8"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        # eighth tracked config: the spatial production workload — the
        # 2D x 3V Taylor-Green solver (Strang MUSCL transport + per-cell
        # collisions), the "production story the collision kernel exists
        # to serve" measured on hardware every round (round-4 verdict ask
        # #1).  Aggregate = cells * 2 collision substeps per step.
        try:
            result["tg2d_16c_nv16"] = _measure_tg2d()
        except Exception as e:
            result["tg2d_16c_nv16"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    except Exception as e:
        result["error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        signal.alarm(0)
    print(json.dumps(result))


def _measure_fused_batch(nv: int, ns: int, e: int, k: int) -> dict:
    """Aggregate evals/s of e INDEPENDENT chained relaxations (vmapped
    megakernel) — the reference's own trial semantics (independent evals,
    ``maxwell_bkw_fftw.cpp:133-140``) in throughput form."""
    cfg = bz.CollisionConfig(nv=nv, ns=ns, impl="fused", dtype="float32")
    pre = bz.build_precomp(cfg)
    g = cfg.velocity_grid
    f0 = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64)
    batch = jnp.asarray(
        np.stack([f0 * (1 + 0.01 * i) for i in range(e)]), jnp.float32
    )
    dq = jnp.asarray(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5)), jnp.float32)
    vcoll = jax.vmap(lambda x: bz.collide(cfg, pre, x))

    @jax.jit
    def chain(x, d):
        out = jax.lax.fori_loop(0, k, lambda i, s: s + 1e-3 * vcoll(s), x)
        err = jnp.max(jnp.abs(bz.collide(cfg, pre, x[0]) - d))
        return jnp.sum(out), err

    s, err = chain(batch, dq)
    float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, err = chain(batch, dq)
        float(s)
        best = min(best, time.perf_counter() - t0)
    rate = (e * k + 1) / best
    return {
        "value": round(rate, 2),
        "unit": "aggregate evals/s",
        "vs_baseline": round(rate / BASELINE_EVALS_PER_S, 3),
        "impl": "fused, vmapped",
        "throughput_class": f"{e}_independent_relaxations",
        "bkw_linf": float(f"{float(err):.4e}"),
    }


def _measure_tg2d(cells: int = 16, nv: int = 16, steps: int = 10) -> dict:
    """Aggregate collision evals/s of the 2D x 3V Taylor-Green solver
    (cells vmapped, every Strang step chained in one jitted scan — the
    cli/taylor_green_2d3v methodology; Results/taylor_green_r5.txt holds
    the full captures with mass/KE/H diagnostics)."""
    from boltzfft import transport
    from boltzfft.cli.taylor_green_2d3v import taylor_green_f0

    impl = "fused" if jax.default_backend() == "tpu" else "rfft"
    cfg = bz.CollisionConfig(nv=nv, ns=12, impl=impl, dtype="float32")
    g = cfg.velocity_grid
    d = 1.0 / cells
    dt = transport.cfl_dt(float(np.abs(np.asarray(g.v)).max()), d)
    collide_fn, pre = bz.make_collision_operator(cfg, jit=False)
    step = transport.make_inhomogeneous_step_2d(
        cfg, collide_fn, dx=d, dy=d, dt=dt, knudsen=0.2
    )
    f0 = taylor_green_f0(cfg, cells, u0=0.8, temperature=3.0)

    @jax.jit
    def run(f, p):
        out = jax.lax.fori_loop(0, steps, lambda i, x: step(x, p), f)
        return jnp.sum(out)

    float(run(f0, pre))  # compile + first
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(f0, pre))
        best = min(best, time.perf_counter() - t0)
    rate = steps * cells * cells * 2 / best
    return {
        "value": round(rate, 1),
        "unit": "aggregate collision evals/s",
        "impl": f"{impl}, cells vmapped",
        "config": f"{cells}x{cells} cells x {nv}^3, {steps} Strang steps",
    }


def _measure_ds(nv: int, ns: int, k: int = 2, **kw) -> dict:
    """Chained ds evals (Ozaki MXU engine) + on-device BKW error check.
    Extra ``kw`` pass through to :func:`collide_ds` (e.g. ``g1_reversal``)."""
    from boltzfft import ds
    from boltzfft.ds_operator import build_ds_precomp, collide_ds

    cfg = bz.CollisionConfig(nv=nv, ns=ns, impl="c2c", dtype="float32")
    pre = build_ds_precomp(cfg)
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    dq = ds.from_f64(np.asarray(bz.bkw_dfdt(g.r_squared(), 6.5), np.float64))
    engine = "oz" if jax.default_backend() == "tpu" else "vpu"
    if engine == "vpu":
        kw = {x: v for x, v in kw.items()
              if x not in ("g1_reversal", "gmain_fused")}

    @jax.jit
    def chain(p, x, d):
        def body(i, s):
            return ds.add(
                s, ds.mul_f(collide_ds(cfg, p, s, contract=engine, **kw), 1e-3)
            )

        out = jax.lax.fori_loop(0, k, body, x)
        e = ds.sub(collide_ds(cfg, p, x, contract=engine, **kw), d)
        idx = jnp.argmax(jnp.abs(e.hi + e.lo))
        return jnp.sum(out.hi), e.hi.reshape(-1)[idx], e.lo.reshape(-1)[idx]

    s, ehi, elo = chain(pre, f, dq)
    float(s)  # warm (compile + run), synced via D2H
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s, ehi, elo = chain(pre, f, dq)
        float(s)
        best = min(best, time.perf_counter() - t0)
    per = best / (k + 1)  # k chained + 1 accuracy eval
    linf = abs(float(np.float64(float(ehi)) + np.float64(float(elo))))
    return {
        "value": round(1.0 / per, 2),
        "unit": "evals/s",
        "impl": f"ds-{engine}",
        "bkw_linf": float(f"{linf:.4e}"),
    }


if __name__ == "__main__":
    main()
