"""Command-line drivers (the reference's L4 layer, argparse instead of TCLAP).

Run as modules, e.g.:

    python -m boltzfft.cli.maxwell_bkw --Nv 32 --Ns 12 --trials 10
    python -m boltzfft.cli.fft_benchmark --Nv 32 --Ns 12
    python -m boltzfft.cli.loop_benchmark --Nv 32 --Ns 12
    python -m boltzfft.cli.ensemble_bkw --ensemble 256 --steps 10

Flags mirror the reference drivers (``maxwell_bkw_fftw.cpp:29-44``).
"""

from __future__ import annotations

import argparse


def standard_parser(description: str) -> argparse.ArgumentParser:
    """Shared flags: --Nv, --Ns, -t/--trials (+ dtype/impl, TPU-era additions)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--Nv", type=int, default=32, help="velocity grid points per axis")
    p.add_argument("--Nvy", type=int, default=None,
                   help="y-axis grid points (default: Nv; reference ctor parity)")
    p.add_argument("--Nvz", type=int, default=None,
                   help="z-axis grid points (default: Nv)")
    p.add_argument("--Ns", type=int, default=12, help="spherical design size")
    p.add_argument("-t", "--trials", type=int, default=1, help="timing trials")
    p.add_argument(
        "--dtype", choices=["float32", "float64"], default=None,
        help="compute dtype (default: float64 if the backend supports it)",
    )
    p.add_argument(
        "--impl", choices=["auto", "rfft", "c2c", "dft", "fused", "ds"],
        default="rfft",
        help="pipeline: rfft (real transforms, default), c2c (reference-"
             "faithful), dft (MXU einsums), fused (Pallas megakernel), "
             "ds (compensated double-single: f64-class accuracy on f32 "
             "TPUs); auto = fused on TPU / rfft elsewhere (the spatial "
             "drivers' default — the vmapped megakernel is ~9x the staged "
             "pipeline on cell batches, Results/taylor_green_r5.txt)",
    )
    p.add_argument(
        "--ds-contract", choices=["vpu", "oz", "ozk"], default=None,
        help="ds transform engine (--impl ds only): vpu = compensated "
             "rank-1 (bit-exact reference), oz = Ozaki-scheme MXU slicing "
             "(TPU default, ~5-7x faster), ozk = force the Pallas kernel",
    )
    p.add_argument(
        "--oz-cmax", type=int, default=None,
        help="Ozaki slice-pair retention for the ds oz/ozk engines "
             "(default 6 = all reference digits; 5 = ~1.3x faster at "
             "last-digit Linf drift, 7 = max retention)",
    )
    p.add_argument(
        "--g-stream", choices=["full", "half"], default=None,
        help="ds oz/ozk inverse-stream formulation: full = direct complex "
             "streams, half = exact half-spectrum Nyquist-block "
             "decomposition (same digits, less transform work; even grids)",
    )
    p.add_argument(
        "--group-batch", type=int, default=None,
        help="ds half path: radial groups per kernel launch set (must "
             "divide the radial group count; default = measured auto "
             "rule, gb=2 on grids <= 32/axis on TPU)",
    )
    p.add_argument(
        "--oz-merge", choices=["on", "off"], default=None,
        help="ds oz/ozk engines: K-merged complex contraction (half the "
             "compensated-fold work; exactness gated per stage by "
             "oz.merge_ok).  Default = measured auto rule (on; +18%% at "
             "32^3, +11%% at 64^3, digits unchanged)",
    )
    p.add_argument(
        "--gmain-fused", choices=["auto", "off", "3", "12"], default="auto",
        help="ds half path: fused main-block kernel mode.  auto = measured "
             "rule (whole-node '3' kernel where it fits, <=~40/axis), off = "
             "staged merged kernels, 3/12 = force the whole-node or "
             "z-half-blocked variant (bit-identical results either way)",
    )
    p.add_argument(
        "--g1-reversal", action="store_true",
        help="ds half path, OPT-IN: derive stream 1 from stream 2 by the "
             "physical velocity reversal — EXACT ONLY for centrally "
             "symmetric f(v) = f(-v) (e.g. the BKW/Maxwellian relaxation "
             "states this driver evaluates); halves the dominant per-node "
             "transform work (~1.4x at 64^3)",
    )
    p.add_argument(
        "--node-chunk", type=int, default=None,
        help="quadrature nodes per scan chunk (memory/speed tradeoff)",
    )
    p.add_argument(
        "--n-radial", type=int, default=None,
        help="Gauss-Legendre radial points (default: Nv, as in the reference)",
    )
    # VHS kernel parameters (defaults: Maxwell molecules, maxwell_bkw_fftw.cpp:54-55)
    p.add_argument("--gamma", type=float, default=0.0,
                   help="VHS velocity exponent (0=Maxwell, 1=hard spheres)")
    p.add_argument("--b-gamma", type=float, default=None,
                   help="VHS kernel coefficient (default 1/(4*pi))")
    p.add_argument(
        "--no-antipodal", dest="antipodal", action="store_false",
        help="evaluate all Ns spherical nodes like the reference instead of "
             "the exact antipodal-pair reduction (Ns/2 nodes, 2x weights)",
    )
    return p


def vhs_kwargs(args) -> dict:
    """CollisionConfig kwargs for the VHS kernel flags."""
    import math

    kw = {"gamma": args.gamma, "antipodal": getattr(args, "antipodal", True)}
    if args.b_gamma is not None:
        kw["b_gamma"] = args.b_gamma
    else:
        kw["b_gamma"] = 1.0 / (4.0 * math.pi)
    return kw


def resolve_impl(impl: str) -> str:
    """Resolve ``--impl auto``: the fused megakernel on TPU (the vmapped
    kernel batches cells at ~9x the staged pipeline — measured,
    Results/taylor_green_r5.txt; it self-degrades to staged rfft past its
    VMEM ceiling), staged rfft elsewhere (interpret-mode Pallas on CPU is
    a debugging path, not a speed path)."""
    if impl != "auto":
        return impl
    import jax

    return "fused" if jax.default_backend() == "tpu" else "rfft"


def enable_cache_default() -> None:
    """Turn on the persistent XLA compilation cache for CLI runs (the FFTW
    wisdom-file analog, `boltzfft.cache`): a driver rerun at the same config
    skips the multi-minute compile.  Respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` and can be disabled with
    ``BOLTZFFT_NO_CACHE=1``.  Failures are non-fatal (read-only homes)."""
    import os

    if os.environ.get("BOLTZFFT_NO_CACHE") == "1":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # jax picks the env var up itself
    try:
        from boltzfft import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass


def default_dtype() -> str:
    """float64 when the active backend supports it, else float32."""
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        return "float32"
    try:
        jnp.zeros((), jnp.float64)
        return "float64"
    except Exception:
        return "float32"
