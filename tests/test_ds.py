"""Tests for the double-single arithmetic layer and compensated pipeline.

The regression that matters most here: XLA backends may duplicate cheap
producers into consumer fusions and FMA-contract them differently, silently
collapsing error-free transformations back to hardware precision.  The
``_opaque`` pin (``lax.reduce_precision`` to the dtype's own format) defends
against this; the broadcast-mul test below reproduces the original failure
(jit of a broadcasting ``ds.mul`` on CPU: 1.7e-8 without the pin, 8.6e-16
with it).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import boltzfft as bz
from boltzfft import ds
from boltzfft.ds_operator import (build_ds_precomp, collide_ds,
                                  make_ds_collision_operator)


RNG = np.random.default_rng(42)


class TestPrimitives:
    def test_split_roundtrip_exact(self):
        a64 = RNG.standard_normal(512)
        x = ds.from_f64(a64, np.float32)
        # hi + lo reconstructs a64 to ~2^-48 relative
        err = np.abs(ds.to_f64(x) - a64) / np.abs(a64)
        assert err.max() < 1e-14
        # hi alone is the f32 rounding
        np.testing.assert_array_equal(np.asarray(x.hi), a64.astype(np.float32))

    def test_two_sum_exact(self):
        a = jnp.asarray(RNG.standard_normal(512), jnp.float32)
        b = jnp.asarray(RNG.standard_normal(512) * 1e-5, jnp.float32)
        s, e = jax.jit(ds.two_sum)(a, b)
        exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_two_prod_exact(self):
        a = jnp.asarray(RNG.standard_normal(512), jnp.float32)
        b = jnp.asarray(RNG.standard_normal(512), jnp.float32)
        p, e = jax.jit(ds.two_prod)(a, b)
        exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)  # f32 products are exact in f64

    @pytest.mark.parametrize("op, ref", [(ds.add, np.add), (ds.mul, np.multiply)])
    def test_ds_ops(self, op, ref):
        a64 = RNG.standard_normal(512)
        b64 = RNG.standard_normal(512)
        r = ds.to_f64(jax.jit(op)(ds.from_f64(a64, np.float32),
                                  ds.from_f64(b64, np.float32)))
        exact = ref(a64, b64)
        # error is relative to the operand scale (under cancellation no
        # format can do better than ~2^-2p of the inputs)
        scale = np.maximum(np.abs(a64), np.abs(b64))
        assert (np.abs(r - exact) / scale).max() < 1e-13

    def test_broadcast_mul_under_jit(self):
        """Regression: XLA fusion duplication + FMA contraction broke the
        EFTs exactly in this broadcasting pattern (error 1.7e-8 without the
        reduce_precision pin)."""
        a64 = RNG.standard_normal((4, 1))
        b64 = RNG.standard_normal((5,))
        r = ds.to_f64(jax.jit(ds.mul)(ds.from_f64(a64, np.float32),
                                      ds.from_f64(b64, np.float32)))
        exact = a64 * b64
        assert (np.abs(r - exact) / np.abs(exact)).max() < 1e-13

    def test_cmul_accuracy(self):
        n = 64
        x64 = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
        y64 = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
        r = ds.cds_to_c128(jax.jit(ds.cmul)(ds.cds_from_f64(x64, np.float32),
                                            ds.cds_from_f64(y64, np.float32)))
        assert (np.abs(r - x64 * y64) / np.abs(x64 * y64)).max() < 1e-12


class TestTransforms:
    def test_contract_last_matches_f64_matmul(self):
        n = 64
        x64 = RNG.standard_normal((4, n)) + 1j * RNG.standard_normal((4, n))
        m64 = RNG.standard_normal((n, 5)) + 1j * RNG.standard_normal((n, 5))
        out = jax.jit(ds.contract_last)(
            ds.cds_from_f64(x64, np.float32), ds.cds_from_f64(m64, np.float32)
        )
        ref = x64 @ m64
        rel = np.abs(ds.cds_to_c128(out) - ref).max() / np.abs(ref).max()
        assert rel < 1e-12

    def test_transform3_matches_fftn(self):
        n = 8
        x64 = RNG.standard_normal((n, n, n)) + 1j * RNG.standard_normal((n, n, n))
        ph = 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
        out = jax.jit(ds.transform3)(
            ds.cds_from_f64(x64, np.float32),
            ds.cds_from_f64(np.exp(-1j * ph), np.float32),
        )
        ref = np.fft.fftn(x64)
        rel = np.abs(ds.cds_to_c128(out) - ref).max() / np.abs(ref).max()
        assert rel < 1e-12


class TestPipeline:
    def test_collide_matches_f64_c2c(self):
        """The compensated f32-pair pipeline reproduces the f64 oracle far
        below the plain-f32 floor (~1e-7)."""
        cfg = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="c2c",
                                 dtype="float64")
        coll, pre = bz.make_collision_operator(cfg)
        g = cfg.velocity_grid
        f64arr = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64)
        q_ref = np.asarray(coll(jnp.asarray(f64arr), pre))

        coll_ds, pre_ds = make_ds_collision_operator(cfg)
        q_ds = ds.to_f64(coll_ds(ds.from_f64(f64arr), pre_ds))
        rel = np.abs(q_ds - q_ref).max() / np.abs(q_ref).max()
        assert rel < 1e-12

    def test_plain_f32_input_promotes(self):
        cfg = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="c2c",
                                 dtype="float32")
        g = cfg.velocity_grid
        f32arr = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float32)
        coll_ds, pre_ds = make_ds_collision_operator(cfg)
        q = coll_ds(f32arr, pre_ds)  # promoted internally
        assert isinstance(q, ds.DS)
        # still beats plain f32: compare against the f64 oracle on the
        # f32-quantized input
        cfg64 = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="c2c",
                                   dtype="float64")
        coll64, pre64 = bz.make_collision_operator(cfg64)
        q_ref = np.asarray(coll64(jnp.asarray(f32arr, jnp.float64), pre64))
        rel = np.abs(ds.to_f64(q) - q_ref).max() / np.abs(q_ref).max()
        assert rel < 1e-12

    def test_vhs_hard_sphere_parity(self):
        # gamma/b_gamma flow through the ds tables (beta1/beta2/gain_w)
        import math

        kw = dict(nv=8, ns=6, n_radial=4, impl="c2c", gamma=1.0,
                  b_gamma=1.0 / (4.0 * math.pi))
        cfg64 = bz.CollisionConfig(dtype="float64", **kw)
        coll, pre = bz.make_collision_operator(cfg64)
        g = cfg64.velocity_grid
        f64arr = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64)
        q_ref = np.asarray(coll(jnp.asarray(f64arr), pre))
        coll_ds, pre_ds = make_ds_collision_operator(
            bz.CollisionConfig(dtype="float32", **kw))
        q_ds = ds.to_f64(coll_ds(ds.from_f64(f64arr), pre_ds))
        rel = np.abs(q_ds - q_ref).max() / np.abs(q_ref).max()
        assert rel < 1e-12

    @pytest.mark.slow
    def test_nv16_parity(self):
        cfg = bz.CollisionConfig(nv=16, ns=12, n_radial=8, impl="c2c",
                                 dtype="float64")
        coll, pre = bz.make_collision_operator(cfg)
        g = cfg.velocity_grid
        f64arr = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64)
        q_ref = np.asarray(coll(jnp.asarray(f64arr), pre))
        coll_ds, pre_ds = make_ds_collision_operator(cfg)
        q_ds = ds.to_f64(coll_ds(ds.from_f64(f64arr), pre_ds))
        rel = np.abs(q_ds - q_ref).max() / np.abs(q_ref).max()
        assert rel < 1e-12


class TestPrecompTables:
    def test_tables_are_exact_splits(self):
        cfg = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="c2c",
                                 dtype="float32")
        pre = build_ds_precomp(cfg)
        # beta2 round-trips to the f64 host value
        from boltzfft.weights import build_precomp
        cfg64 = bz.CollisionConfig(nv=8, ns=6, n_radial=4, impl="c2c",
                                   dtype="float64")
        pre64 = build_precomp(cfg64)
        b2 = ds.to_f64(pre.beta2)
        np.testing.assert_allclose(b2, np.asarray(pre64.beta2), rtol=1e-14)


class TestNyquistContent:
    def test_under_resolved_input_keeps_f64_parity(self):
        # Regression (round-3 review): alpha1 at the unpaired Nyquist mode
        # is complex, so g1/g2 are NOT exactly real — a noisy, under-resolved
        # input has O(1) Nyquist content and the ds pipeline must still match
        # the complex f64 reference to ds accuracy (the rfft impl's Nyquist
        # approximation must not leak into this accuracy instrument).
        rng = np.random.RandomState(7)
        cfg64 = bz.CollisionConfig(nv=6, ns=6, n_radial=3, impl="c2c",
                                   dtype="float64")
        coll, pre64 = bz.make_collision_operator(cfg64)
        g = cfg64.velocity_grid
        f64 = np.asarray(bz.bkw_f(g.r_squared(), 6.5), np.float64)
        f64 = f64 * (1.0 + 0.3 * rng.rand(*f64.shape))  # Nyquist-rich
        q_ref = np.asarray(coll(f64, pre64), np.float64)

        cfg = bz.CollisionConfig(nv=6, ns=6, n_radial=3, impl="c2c",
                                 dtype="float32")
        pre = build_ds_precomp(cfg)
        q = ds.to_f64(collide_ds(cfg, pre, ds.from_f64(f64), contract="vpu"))
        rel = np.max(np.abs(q - q_ref)) / np.max(np.abs(q_ref))
        assert rel < 1e-12, rel
