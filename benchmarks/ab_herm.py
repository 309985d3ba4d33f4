"""A/B probe: full-spectrum vs Hermitian half-z downstream stages at 64^3.

Times (chained, null-calibrated) the full-spectrum forward/finale of the
ds-oz half path against the Hermitian half-z ones.  Found the round-3
result recorded in ds_operator.collide_ds: the half-depth forward is 1.3x
faster in isolation even at 64^3, but the pipeline regresses above 32^3 --
use collide_ds(herm_downstream=...) for the end-to-end A/B.
"""
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
    _corr_ck,
    _cds_sum_first,
    _ds_sum_last,
    _fwd2_batched,
    _fwd_herm_half,
    _inv_herm_half,
    _pipeline_slicing,
    build_ds_precomp,
)

CHAIN = 192


def chained(body, init, chain=CHAIN, trials=3, extras=()):
    @jax.jit
    def run(c0, *ex):
        return jax.lax.fori_loop(0, chain, lambda i, c: body(c, *ex), c0)

    sync = lambda o: float(jnp.sum(jax.tree.leaves(o)[0]))
    out = run(init, *extras)
    sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run(init, *extras)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    nv, ns = 64, 12
    bz.enable_compilation_cache("/root/repo/.xla_cache")
    cfg = bz.CollisionConfig(nv=nv, ns=ns, impl="c2c", dtype="float32")
    pre = build_ds_precomp(cfg)
    slw, _, cmax = _pipeline_slicing(cfg)
    ftail = DS_PIPELINE_FOLD_TAIL
    g = cfg.velocity_grid
    f = ds.from_f64(np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64))
    fh = ds.cds_from_real(f)
    n_groups = pre.gain_w.hi.shape[0]
    nzh = nv // 2
    szv = jnp.asarray((-1.0) ** np.arange(nv), jnp.float32)
    ckc = _corr_ck(None, cmax, slw, ftail)
    fwd_xy = (pre.vfwd_sl, pre.vfwd_sl)
    inv_xy = (pre.vinv_sl, pre.vinv_sl)
    damp = 0.75

    null = chained(
        lambda c: jax.tree.map(lambda a: a * damp, c),
        jax.tree.map(lambda a: a[:1, :1, :1], fh),
    )
    print(f"null: {null*1e3:.3f} ms/call", flush=True)

    def stage(name, body, init, count=1):
        per = max(chained(body, init) - null, 0.0)
        print(f"{name:16s} {per*1e3:8.3f} ms/call x{count} = "
              f"{per*count*1e3:7.2f} ms/eval", flush=True)

    # OLD full-spectrum forward of the (real) group sum
    tf_fwd = partial(oz.transform3_oz, m=pre.vfwd_sl, cmax=cmax, w=slw,
                     fold_tail=ftail)
    stage(
        "fwd-full",
        lambda c: jax.tree.map(
            lambda a: a * damp, tf_fwd(ds.cds_from_real(c), real_in=True)
        ).re,
        f, n_groups,
    )

    # NEW: half-z main + q line sum
    def fwdh(c):
        u, q = _fwd_herm_half(c, ckc, fwd_xy, pre.vfwd_zh_sl, szv)
        hi = jnp.concatenate([u.re.hi, u.im.hi], -1) * damp
        hi = hi + (q.hi + q.lo)[..., None]
        lo = jnp.concatenate([u.re.lo, u.im.lo], -1) * damp
        return DSNT(hi, lo)

    from boltzfft.ds import DS as DSNT
    stage("fwd-herm", fwdh, f, n_groups)

    # q line sum alone
    stage(
        "qsum",
        lambda c: DSNT(
            c.hi * damp + _ds_sum_last(DSNT(c.hi * szv, c.lo * szv)).hi[..., None] * 0.001,
            c.lo * damp,
        ),
        f, n_groups,
    )

    # OLD finale: stacked full-spectrum inverse
    tf_inv = partial(oz.transform3_oz, m=pre.vinv_sl, cmax=cmax, w=slw,
                     fold_tail=ftail)
    both0 = jax.tree.map(lambda a: jnp.stack((a, a)), fh)

    def finf(c):
        out = tf_inv(c, real_out=True).re  # DS (2, N, N, N)
        d = jax.tree.map(lambda a: a * damp, out)
        from boltzfft.ds import CDS
        return CDS(d, d)

    stage("finale-full", finf, both0)

    # NEW finale: half-z main + plane, incl. batched plane fwd + fold
    am0 = jax.tree.map(lambda a: jnp.stack((a, a))[..., :nzh], fh)
    qs0 = ds.DS(
        jnp.broadcast_to(f.hi[None, :, :, 0], (n_groups, nv, nv)),
        jnp.broadcast_to(f.lo[None, :, :, 0], (n_groups, nv, nv)),
    )
    beta1p = jax.tree.map(lambda a: a[..., nzh], pre.beta1)

    from boltzfft.ds import CDS

    def finh(c):
        am, qs = c
        ap = _cds_sum_first(ds.cmul_ds(_fwd2_batched(qs, ckc, fwd_xy), beta1p))
        ap2 = jax.tree.map(lambda a: jnp.stack((a, a)), ap)
        out = _inv_herm_half(am, ap2, ckc, inv_xy, pre.vinv_zh_sl, nv, szv)
        am_new = CDS(
            DSNT(am.re.hi * damp + out.hi[..., :nzh] * 1e-3,
                 am.re.lo * damp + out.lo[..., :nzh] * 1e-3),
            DSNT(am.im.hi * damp, am.im.lo * damp),
        )
        qs_new = DSNT(qs.hi * damp, qs.lo * damp)
        return (am_new, qs_new)

    stage("finale-herm", finh, (am0, qs0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
