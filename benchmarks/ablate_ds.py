"""Stage-level ablation of the ds-oz collision pipeline on TPU.

Times each pipeline stage with the chained in-graph harness (the only
valid timing through the remote-TPU tunnel — see docs/PERFORMANCE.md
"Why chained-only timing") and reconciles the per-stage model against the
measured full evaluation:

    python benchmarks/ablate_ds.py --nv 64 --ns 12 --chain 64

Default stages model the HALF-SPECTRUM path (the TPU default on even
grids; counts per eval, G radial groups x S sub-batches of C nodes):
  g-main-half   _g_main_half, both streams concatenated          (G*S)
  hadamard-half fused reconstruct+Hadamard+sum kernel            (G*S)
  corrections   _nyq_corrections, batched all nodes              (2)
  fwd-transform transform3_oz of the REAL group sum (real_in)    (G)
  beta1-acc     cmul_ds(h_hat, beta1) + cadd into the gain acc   (G)
  fixed         forward of f (real_in) + stacked real_out inverses +
                loss multiply + final assembly                   (1)
``--full-stream`` times the g_stream="full" stages instead
(transform3_oz_nodemat g1/g2 at 2*G*S + hadamard_wsum).

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
    DS_PIPELINE_MERGE,
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
    p.add_argument("--no-merged", action="store_true",
                   help="model the UNMERGED contractions (the pipeline "
                        "default is oz_merge=True; the stage bodies must "
                        "match it or the split is stale)")
    p.add_argument("--full-stream", action="store_true",
                   help="time the full-stream (g_stream='full') stages "
                        "instead of the default half-spectrum ones")
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
    use_pre = not args.no_preslice and jax.default_backend() == "tpu"
    tf_fwd = partial(oz.transform3_oz, m=pre.vfwd_sl, cmax=cmax, w=slw,
                     fold_tail=ftail)
    half = pre.pmz_half1w is not None and not args.full_stream
    if half:
        from boltzfft.ds import CDS, DS
        from boltzfft.ds_operator import (
            _assemble_g_half, _corr_ck, _g_main_half, _nyq_corrections,
        )

        nxg, nyg, nzg = cfg.grid_shape
        nzh = nzg // 2
        ckc = _corr_ck(None, cmax, slw, ftail)
        signs = tuple(
            jnp.asarray((-1.0) ** np.arange(n), jnp.float32)
            for n in (nxg, nyg, nzg)
        )
        kxm = jnp.asarray(np.arange(nxg) != nxg // 2, jnp.float32)
        kym = jnp.asarray(np.arange(nyg) != nyg // 2, jnp.float32)
        fmask = kxm[:, None, None] * kym[None, :, None]
        fhs = ds._swap_last2(
            jax.tree.map(lambda a: a[..., :nzh] * fmask, fh)
        )
        cat = lambda a, b: jax.tree.map(
            lambda x, y: jnp.concatenate((x, y)), a, b
        )
        take0 = lambda t: jax.tree.map(lambda a: a[0, :sb], t)
        m_y = cat(take0(pre.pm1[1]), take0(pre.pm2[1]))
        m_x = cat(take0(pre.pm1[0]), take0(pre.pm2[0]))
        m_zh = cat(take0(pre.pmz_half1w), take0(pre.pmz_half2))

        # mirror collide_ds's per-stage merge gate (stale-split bug round 4:
        # the pipeline default merged its g-main stages while this model
        # timed unmerged ones)
        mg = not args.no_merged and DS_PIPELINE_MERGE
        mok = lambda mm: mg and oz.merge_ok(
            mm.re.shape[-2], sm=mm.re.shape[-3], cmax=cmax, w=slw
        )

        def gmain_body(c):
            xp = (
                oz.preslice_rows(c, cmax=cmax, w=slw, interpret=False,
                                 merged=mok(m_y))
                if use_pre else None
            )
            r12 = _g_main_half(c, xp, m_y, m_x, m_zh, cmax, slw, ftail,
                               merged=mg)
            add_h = r12.hi[0, :, :, :nzh].transpose(0, 2, 1) * 1e-3
            add_l = r12.lo[0, :, :, :nzh].transpose(0, 2, 1) * 1e-3
            return CDS(
                DS(c.re.hi * damp + add_h, c.re.lo * damp + add_l),
                DS(c.im.hi * damp, c.im.lo * damp),
            )

        stage("g-main-half", gmain_body, fhs, n_groups * n_sub)

        corr1 = _nyq_corrections(
            cfg, pre, fh, ckc, conj=False, coef=pre.nyq_coef_w
        )
        corr2 = _nyq_corrections(cfg, pre, fh, ckc, conj=True)
        c1_0 = jax.tree.map(lambda a: a[0, :sb], corr1)
        c2_0 = jax.tree.map(lambda a: a[0, :sb], corr2)
        rfake = DS(
            jnp.broadcast_to(f.hi, (sb,) + f.hi.shape),
            jnp.broadcast_to(f.lo, (sb,) + f.lo.shape),
        )

        def had_body(c):
            part = oz.hadamard_wsum_half(
                c, c1_0, c, c2_0, None, cfg.grid_shape, signs,
                _assemble_g_half,
            )
            return DS(c.hi * damp + part.hi[None] * 1e-3,
                      c.lo * damp + part.lo[None] * 1e-3)

        stage("hadamard-half", had_body, rfake, n_groups * n_sub)

        def corr_body(c):
            px, py, pz = _nyq_corrections(
                cfg, pre, c, ckc, conj=False, coef=pre.nyq_coef_w
            )
            bump = (
                px.re.hi[0, 0][None, :, :] * 1e-3
                + py.re.hi[0, 0][:, None, :] * 1e-3
                + pz.re.hi[0, 0][..., None] * 1e-3
            )
            return CDS(
                DS(c.re.hi * damp + bump, c.re.lo * damp),
                DS(c.im.hi * damp, c.im.lo * damp),
            )

        stage("corrections", corr_body, fh, 2)

        def fwd_body(c):
            out = tf_fwd(
                ds.cds_from_real(DS(c.re.hi, c.re.lo)), real_in=True
            )
            return jax.tree.map(lambda a, b: a * damp + b * 1e-3, c, out)

        stage("fwd-transform", fwd_body, fh, n_groups)
    else:
        tf_nodemat = partial(oz.transform3_oz_nodemat, cmax=cmax, w=slw,
                             fold_tail=ftail)
        if use_pre:
            # the pipeline pre-slices f_hat once per eval; the stage body
            # must re-derive the chunks from the carry so the measurement
            # keeps the data dependency (cost amortized in-pipeline,
            # counted once here)
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
                lambda c: jax.tree.map(
                    lambda a: a[0] * damp, tf_nodemat(c, m1)
                ),
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
