"""MXU shape microbenchmark: what does a (64,64)@(64,4096) matmul cost?

The ct megakernel's per-node x-axis transform is a (N, N) @ (N, N^2)
left-multiply; at 64^3 that is M=K=64 — a quarter of the 128x128 systolic
tile.  This probe measures achieved FLOP/s for candidate shapes inside a
Pallas kernel (same conditions as the megakernel: VMEM-resident operands,
repeated dots) to decide whether block-diagonal node-pairing
(kron(I_2, V) -> M=K=128 at 2x the FLOPs) is a win.

Run on the TPU:  python benchmarks/mxu_shapes.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, *, reps, par):
    """``par`` independent serial dot chains: serial dependence within a
    chain defeats hoisting, independence across chains exposes the ILP the
    real megakernel has (its per-node dots are independent)."""
    a = a_ref[:]
    accs = [b_ref[:] * (1.0 + 0.001 * p) for p in range(par)]

    def body(i, accs):
        return tuple(
            jnp.dot(a, x, preferred_element_type=x.dtype) for x in accs
        )

    accs = jax.lax.fori_loop(0, reps, body, tuple(accs))
    out = accs[0]
    for x in accs[1:]:
        out = out + x
    o_ref[:] = out


def time_shape(m, k, n, reps=None, trials=3, chain=4, par=None):
    if par is None:  # bound the live chain state to ~72 MB of VMEM
        par = max(1, min(8, (72 << 20) // (k * n * 4)))
    if reps is None:  # target ~4e12 FLOPs per timed call so the ~30 ms
        # dispatch RTT of the remote-TPU relay is negligible
        reps = max(32, int(4e12 / (chain * par * 2 * m * k * n)))
    a = jnp.asarray(np.random.default_rng(0).standard_normal((m, k)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((k, n)), jnp.float32)
    a = a / (1.0 + np.abs(np.asarray(a)).max())  # keep chains bounded

    call = pl.pallas_call(
        partial(_kernel, reps=reps, par=par),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def chained(a, b):
        def body(i, x):
            return call(a, x)
        return jax.lax.fori_loop(0, chain, body, b)

    out = chained(a, b)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(chained(a, b)))
        best = min(best, time.perf_counter() - t0)
    flops = 2.0 * m * k * n * reps * chain * par
    return flops / best


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for m, k, n in [
        (64, 64, 4096),     # current per-node x transform at 64^3
        (128, 128, 4096),   # block-diag node pair (2x FLOPs, half useful)
        (256, 256, 4096),   # block-diag node quad
        (128, 128, 8192),   # pair + both sides on lanes
        # ((1024,1024)@(1024,4096) and (512,512)@(512,4096) crash the
        # round-5 tunnel's compile helper with a register-spill VMEM OOM —
        # the r2 environment compiled them; measured 2026-08-20, skip)
        (64, 64, 8192),
        (32, 32, 4096),     # kron-scheme x at 32^3; also the radix-2
                            # even/odd x-split stage shape at 64^3
        (128, 64, 4096),    # sublane-parity candidate: schoolbook complex
                            # product with [ar; ai] stacked on sublanes
                            # (2 such dots replace 3 Karatsuba (64,64) dots
                            # at 4/3 the MACs but full systolic rows)
        (96, 96, 4096),     # 96^3 per-node x shape (for the ds 96^3 row)
    ]:
        fs = time_shape(m, k, n)
        print(f"({m:4d},{k:4d}) @ ({k:4d},{n:5d}): {fs/1e12:7.2f} TFLOP/s")
