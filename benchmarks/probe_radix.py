"""Radix-factorized Ozaki transform: the decisive shape + overhead probe.

Round-4 verdict ask #2: factor the ds-oz per-node dense (N, N) sliced
matmuls as N = R*S two-stage contractions (the ds analog of the f32 ct
scheme) for a ~N/(R+S) MAC cut on the g-main stage (60% of the 64^3 eval).

Whether that MAC cut survives depends on three measurables, captured here:

1. **bf16 staircase dot-shape rates.**  The oz kernels' level dots are
   (rows, K) @ (K, L) bf16 matmuls with f32 accumulation (rows = row block
   ~512, K = L = N).  A two-stage radix split replaces K = L = 64 dots
   with K = L = S and K = L = R dots (8x8 at the balanced R = S = 8 split;
   32x32 at radix-2).  The MXU is a 128x128 systolic array: if the small
   shapes' achieved rate drops faster than the MAC count (64 -> 16 per
   element at R = S = 8), the split loses before any overhead is counted.
   (The f32 analog was already measured dead at radix-2 in round 2:
   `docs/PERFORMANCE.md` "MXU shape study" — (32,32) efficiency falls
   faster than the halved FLOPs.  This probe measures the bf16/oz regime.)

2. **The inter-stage re-slice cost.**  Stage-A outputs are compensated f32
   pairs; stage B needs 7-bit bf16 chunks again, so every intermediate
   element pays one `preslice_rows`-class extraction (multiply-free VPU
   mask/scale passes, sx chunk planes per component).  Measured here as
   s/element on the real intermediate size, it is the floor the MAC win
   must clear: at 64^3 the g-main contracts ~2 streams x 384 nodes x 2048
   rows x 64 lanes per axis — one extra full re-slice per axis pass.

3. **Exactness bookkeeping** (no device needed): stage-A alpha-folded
   coefficients are irrational, so stage-A output chunks are NOT 7-bit
   values and cannot feed stage B unsliced — the re-slice in (2) is
   mandatory, not an implementation choice.  (A butterfly-only stage-A —
   plain adds of chunk planes, which WOULD stay exact — does not exist
   here: the per-node alpha phases attach to the input modes, so every
   stage-A term carries an irrational coefficient.)

Run on the TPU (default env):  python benchmarks/probe_radix.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_kernel(a_ref, b_ref, o_ref, *, reps, par):
    """Serial chains of independent bf16 dots with f32 accumulation — the
    oz staircase level-dot pattern (same x block against many matrices)."""
    a = a_ref[:]
    accs = [
        b_ref[:].astype(jnp.float32) * (1.0 + 0.001 * p) for p in range(par)
    ]

    def body(i, accs):
        return tuple(
            jnp.dot(
                a, x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )[: x.shape[0]]
            for x in accs
        )

    accs = jax.lax.fori_loop(0, reps, body, tuple(accs))
    out = accs[0]
    for x in accs[1:]:
        out = out + x
    o_ref[:] = out


def time_bf16_dot(rows, k, ell, trials=3, chain=4, par=8, reps=None):
    """Achieved MAC/s for (rows, k) bf16 @ (k, ell) bf16 -> f32."""
    if reps is None:
        reps = max(64, int(1.5e12 / (chain * par * 2 * rows * k * ell)))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((rows, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, ell)), jnp.float32)
    b = b / (1.0 + float(np.abs(np.asarray(b)).max()))

    call = pl.pallas_call(
        partial(_dot_kernel, reps=reps, par=par),
        out_shape=jax.ShapeDtypeStruct((k, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def chained(a, b):
        def body(i, x):
            return call(a, x)
        return jax.lax.fori_loop(0, chain, body, b)

    float(jnp.sum(chained(a, b)))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(chained(a, b)))
        best = min(best, time.perf_counter() - t0)
    macs = float(rows) * k * ell * reps * chain * par
    return macs / best


def time_preslice(rows, k, trials=3, chain=8):
    """s/element of the chunk extraction a radix split must re-run on every
    inter-stage intermediate (the existing preslice_rows kernel)."""
    from boltzfft import ds, oz

    rng = np.random.default_rng(1)
    x = ds.cds_from_f64(
        rng.standard_normal((rows, k)) + 1j * rng.standard_normal((rows, k))
    )

    @jax.jit
    def chained(x):
        def body(i, c):
            p = oz.preslice_rows(jax.tree.map(lambda a: a + c, x))
            return jnp.sum(p.all_re[..., :1].astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    float(chained(x))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    return best / (chain * rows * k)


def main():
    print(f"backend: {jax.default_backend()}")
    print("\n## bf16 staircase dot shapes (rows, K) @ (K, L), f32 accum")
    print("# The CURRENT dense kernel does NOT issue (64,64) dots: the "
          "block-Toeplitz staircase\n# (_toeplitz_mats, _GROUP_LEVELS=2) "
          "lane-concatenates chunk prefixes and level pairs,\n# so its "
          "level-group dots are (rb, n*64) @ (n*64, 128) with n = 2/4/6/7 "
          "— deep-K,\n# full-lane shapes.  A radix-R*S factorization "
          "shrinks BOTH dims by N/S per stage.")
    rowcases = [
        # current dense kernel's actual staircase group shapes (K block 64)
        (512, 128, 128, "dense group 0 (n=2)"),
        (512, 256, 128, "dense group 1 (n=4)"),
        (512, 384, 128, "dense group 2 (n=6)"),
        (512, 448, 64, "dense tail group (n=7, 1 level)"),
        # radix-2 stage analogs (K block 32, same staircase structure)
        (512, 64, 64, "radix-2 group 0"),
        (512, 128, 64, "radix-2 group 1"),
        (512, 192, 64, "radix-2 group 2"),
        # balanced R=S=8 stage analogs (K block 8)
        (512, 16, 16, "radix-8 group 0"),
        (512, 32, 16, "radix-8 group 1"),
        (512, 48, 16, "radix-8 group 2"),
        # single-block comparison ladder (no staircase concatenation)
        (512, 64, 64, "plain 64x64 block"),
        (512, 32, 32, "plain 32x32 block"),
        (512, 8, 8, "plain 8x8 block"),
    ]
    print(f"{'shape':>24s} {'TMAC/s':>8s}")
    for rows, k, ell, label in rowcases:
        rate = time_bf16_dot(rows, k, ell)
        print(f"({rows:5d},{k:4d})@({k:4d},{ell:3d}) {rate/1e12:8.2f}"
              f"  # {label}")

    print("\n## inter-stage re-slice cost (preslice_rows, sx=7)")
    for rows, k in [(2048, 64), (4096, 64)]:
        s = time_preslice(rows, k)
        print(f"rows={rows} k={k}: {s*1e9:.2f} ns/elem "
              f"({rows*k} elems -> {s*rows*k*1e3:.3f} ms/pass)")
    print("\n(One radix stage adds one full re-slice of the intermediate "
          "per axis per node-stream; the g-main at 64^3 touches ~2 streams "
          "x 384 nodes x 2048 rows x 64 lanes per axis.)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
