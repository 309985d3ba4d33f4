"""Stage-level ablation of the ds-oz collision pipeline on TPU.

Times each pipeline stage with the chained in-graph harness (the only
valid timing through the remote-TPU tunnel — see docs/PERFORMANCE.md
"Why chained-only timing") and reconciles the per-stage model against the
measured full evaluation:

    python benchmarks/ablate_ds.py --nv 64 --ns 12 --chain 64

Stages (counts per eval, G radial groups x S sub-batches of C nodes):
  g-transform   transform3_oz_nodemat, the g1/g2 inverse streams (2*G*S)
  hadamard      fused Hadamard + weighted group sum kernel        (G*S)
  fwd-transform transform3_oz of the group sum                    (G)
  beta1-acc     cmul_ds(h_hat, beta1) + cadd into the gain acc    (G)
  fixed         forward of f (real_in) + two real_out inverses +
                loss multiply + final assembly                    (1)

This is the tool that found the round-3 v4 bottleneck ordering; keep its
output in Results/ when the kernel changes.
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import boltzfft as bz
from boltzfft import ds, oz
from boltzfft.ds_operator import (
    DS_PIPELINE_FOLD_TAIL,
    _pipeline_slicing,
    build_ds_precomp,
    collide_ds,
)


def chained(body, init, chain, trials=3, extras=()):
    """Best-of-trials seconds per call of ``body(carry, *extras) -> carry``.

    Two traps this harness exists to avoid (both hit while building it):
    * the carry MUST flow through the measured computation — a body whose
      output does not feed the next iteration gets hoisted out of the
      loop by XLA and the measurement collapses to one run;
    * large tables must arrive via ``extras`` (jit ARGUMENTS) — closed
      over, they are baked into the program as literals and the remote
      compile request blows the tunnel's size limit (HTTP 413).
    The residual per-call dispatch overhead is ~30 ms / chain; the caller
    calibrates it away with a null body (see main)."""

    @jax.jit
    def run(c0, *ex):
        return jax.lax.fori_loop(0, chain, lambda i, c: body(c, *ex), c0)

    sync = lambda o: float(jnp.sum(jax.tree.leaves(o)[0]))
    out = run(init, *extras)
    sync(out)  # compile + sync
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run(init, *extras)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--nv", type=int, default=64)
    p.add_argument("--ns", type=int, default=12)
    p.add_argument("--chain", type=int, default=192)
    p.add_argument("--sub-batch", type=int, default=2)
    p.add_argument("--eval-chain", type=int, default=4,
                   help="chain length for the full-eval measurement")
    p.add_argument("--no-preslice", action="store_true",
                   help="measure the g-transform stage without the "
                        "pre-sliced shared-operand mode")
    args = p.parse_args(argv)

    bz.enable_compilation_cache("/root/repo/.xla_cache")
    print(f"backend: {jax.default_backend()}", flush=True)

    cfg = bz.CollisionConfig(nv=args.nv, ns=args.ns, impl="c2c",
                             dtype="float32")
    pre = build_ds_precomp(cfg)
    slw, _, cmax = _pipeline_slicing(cfg)
    ftail = DS_PIPELINE_FOLD_TAIL
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    fh = ds.cds_from_real(f)
    sb = min(args.sub_batch, cfg.ns_eff)
    n_groups = pre.gain_w.hi.shape[0]
    n_sub = -(-cfg.ns_eff // sb)

    m1 = tuple(jax.tree.map(lambda a: a[0, :sb], m) for m in pre.pm1)
    gfake = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (sb,) + a.shape), fh
    )
    w_sb = jax.tree.map(lambda a: a[0, :sb], pre.gain_w)

    rows = []
    damp = 0.75  # keeps chained iterates finite and normal

    # calibrate the per-call dispatch/sync overhead with a null body
    null = chained(
        lambda c: jax.tree.map(lambda a: a * damp, c),
        jax.tree.map(lambda a: a[:1, :1, :1], fh), args.chain,
    )
    print(f"null-chain overhead: {null*1e3:.3f} ms/call (subtracted)",
          flush=True)

    def stage(name, body, init, count):
        per = max(chained(body, init, args.chain) - null, 0.0)
        rows.append((name, per, count))
        print(f"  {name:14s} {per*1e3:8.3f} ms/call  x{count}", flush=True)

    print("per-stage (chained):", flush=True)
    tf_nodemat = partial(oz.transform3_oz_nodemat, cmax=cmax, w=slw,
                         fold_tail=ftail)
    use_pre = not args.no_preslice and jax.default_backend() == "tpu"
    if use_pre:
        # the pipeline pre-slices f_hat once per eval; the stage body must
        # re-derive the chunks from the carry so the measurement keeps the
        # data dependency (cost is amortized in-pipeline, counted once here)
        stage(
            "g-transform",
            lambda c: jax.tree.map(
                lambda a: a[0] * damp,
                tf_nodemat(c, m1, x_pre=oz.preslice_rows(
                    c, cmax=cmax, w=slw, interpret=False)),
            ),
            fh, 2 * n_groups * n_sub,
        )
    else:
        stage(
            "g-transform",
            lambda c: jax.tree.map(lambda a: a[0] * damp, tf_nodemat(c, m1)),
            fh, 2 * n_groups * n_sub,
        )
    stage(
        "hadamard",
        lambda c: jax.tree.map(
            lambda a: jnp.broadcast_to(a * damp, (sb,) + a.shape),
            oz.hadamard_wsum(c, c, w_sb),
        ),
        gfake, n_groups * n_sub,
    )
    tf_fwd = partial(oz.transform3_oz, m=pre.vfwd_sl, cmax=cmax, w=slw,
                     fold_tail=ftail)
    stage(
        "fwd-transform",
        lambda c: jax.tree.map(lambda a: a * damp, tf_fwd(c)),
        fh, n_groups,
    )
    b1_0 = jax.tree.map(lambda a: a[0], pre.beta1)
    stage(
        "beta1-acc",
        lambda c: jax.tree.map(
            lambda a: a * damp, ds.cadd(c, ds.cmul_ds(c, b1_0))
        ),
        fh, n_groups,
    )

    model = sum(per * count for _, per, count in rows)

    # full eval, same harness as bench.py (pre as a jit ARGUMENT — closed
    # over it blows the remote-compile size limit)
    per_eval = chained(
        lambda c, p: ds.add(c, ds.mul_f(
            collide_ds(cfg, p, c, contract="oz", sub_batch=sb), 1e-3
        )),
        f, args.eval_chain, extras=(pre,),
    )
    print(f"\nfull eval: {per_eval*1e3:.1f} ms ({1.0/per_eval:.2f} evals/s)")
    print(f"stage model total: {model*1e3:.1f} ms "
          f"({100.0*model/per_eval:.0f}% of measured; the remainder is "
          f"fixed work + scan/launch overhead)")
    for name, per, count in rows:
        print(f"  {name:14s} {per*count*1e3:8.1f} ms/eval "
              f"({100.0*per*count/per_eval:4.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
