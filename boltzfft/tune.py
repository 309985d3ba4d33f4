"""Timing-probe autotuner for the fused megakernel's blocking parameters.

``fused_nodes_per_step`` (nodes per sequential grid step) and
``fused_sub_batch`` (nodes stacked per inner matmul operand) trade VMEM
footprint against matmul fatness; the best point depends on grid size,
quadrature batch and chip generation.  This is the TPU analog of the
reference's FFTW planner/wisdom machinery (``FFTWBoltzmannOperator.cpp:60-68``
spends startup time measuring plans, then caches the winner) — here the
probe times a short chained run per candidate and memoizes the winner
in-process and optionally on disk.

    cfg = bz.autotune_fused(bz.CollisionConfig(nv=64, ns=12, impl="fused",
                                               dtype="float32"))
    collide_fn, pre = bz.make_collision_operator(cfg)
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional, Sequence, Tuple

from .weights import CollisionConfig

_MEMO: dict = {}


def _probe_key(cfg: CollisionConfig) -> tuple:
    return (
        cfg.nv, cfg.ns, cfg.n_gl, cfg.dtype, cfg.fused_scheme,
        cfg.fused_precision, cfg.fused_radix,
    )


def _default_candidates(cfg: CollisionConfig) -> list:
    """Distinct (nodes_per_step, sub_batch) points worth probing.

    Candidates are normalized through the kernel's own blocking rules so
    duplicates collapse before any compile is paid.
    """
    from . import pallas_kernels as pk

    b = cfg.n_nodes
    seen, cands = set(), []
    for nps in (cfg.ns_eff, 2 * cfg.ns_eff, 24, 48, 4 * cfg.ns_eff):
        for sb in (0, 4, 8):
            try:
                c, cc, gs = pk._ct_node_blocking(b, cfg.nv, nps, cfg.ns_eff, sb)
            except ValueError:
                continue
            if (c, cc) in seen:
                continue
            seen.add((c, cc))
            cands.append((nps, sb))
    return cands


def _time_candidate(cfg: CollisionConfig, k: int, trials: int) -> float:
    """Best-of-``trials`` seconds per eval, k-chained (the only valid timing
    methodology on relay-attached TPUs; see docs/PERFORMANCE.md)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import bkw as _bkw
    from .operator import collide
    from .weights import build_precomp

    pre = build_precomp(cfg)
    f0 = jnp.asarray(
        np.asarray(_bkw.bkw_f(cfg.velocity_grid.r_squared(), 6.5)),
        cfg.real_dtype,
    )

    @partial(jax.jit, static_argnums=2)
    def chain(f, p, steps):
        body = lambda i, x: x + 1e-3 * collide(cfg, p, x)
        return jax.lax.fori_loop(0, steps, body, f)

    out = chain(f0, pre, k)
    float(jnp.sum(out))  # compile + sync
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = chain(f0, pre, k)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / k


def autotune_fused(
    cfg: CollisionConfig,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    k: int = 8,
    trials: int = 2,
    verbose: bool = False,
    cache_file: Optional[str] = None,
) -> CollisionConfig:
    """Return ``cfg`` with measured-best fused blocking parameters.

    Each candidate costs one XLA compile (~20-40 s cold on TPU; cached by the
    persistent compilation cache after) plus a short timed run.  Results are
    memoized per (grid, quadrature, scheme, dtype) in-process, and in
    ``cache_file`` (JSON) when given — the wisdom-file analog.
    """
    if cfg.impl != "fused":
        return cfg
    key = _probe_key(cfg)
    skey = "/".join(map(str, key))

    if key in _MEMO:
        nps, sb = _MEMO[key]
        return dataclasses.replace(
            cfg, fused_nodes_per_step=nps, fused_sub_batch=sb
        )
    if cache_file and Path(cache_file).exists():
        store = json.loads(Path(cache_file).read_text())
        if skey in store:
            nps, sb = store[skey]
            _MEMO[key] = (nps, sb)
            return dataclasses.replace(
                cfg, fused_nodes_per_step=nps, fused_sub_batch=sb
            )

    cands = list(candidates) if candidates is not None else _default_candidates(cfg)
    best, best_t = (cfg.fused_nodes_per_step, cfg.fused_sub_batch), float("inf")
    for nps, sb in cands:
        trial_cfg = dataclasses.replace(
            cfg, fused_nodes_per_step=nps, fused_sub_batch=sb
        )
        try:
            t = _time_candidate(trial_cfg, k, trials)
        except Exception as e:  # candidate fails to compile/fit: skip it
            if verbose:
                print(f"autotune: ({nps}, {sb}) failed: {type(e).__name__}: {e}")
            continue
        if verbose:
            print(f"autotune: nodes_per_step={nps} sub_batch={sb} -> "
                  f"{t:.4e} s/eval")
        if t < best_t:
            best, best_t = (nps, sb), t
    _MEMO[key] = best
    if cache_file:
        p = Path(cache_file)
        store = json.loads(p.read_text()) if p.exists() else {}
        store[skey] = list(best)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(store, indent=1))
    return dataclasses.replace(
        cfg, fused_nodes_per_step=best[0], fused_sub_batch=best[1]
    )
