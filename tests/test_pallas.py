"""Pallas fused kernels vs the jnp reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import boltzfft as bz
from boltzfft import pallas_kernels as pk


class TestGainReduce:
    @pytest.mark.parametrize("b,m", [(12, 256), (24, 17 * 16 * 16), (6, 320)])
    def test_matches_dense_reduction(self, b, m):
        # m=320 is not a multiple of 128 — exercises lane padding + unpad
        rng = np.random.RandomState(0)
        h_r = jnp.asarray(rng.randn(b, m), jnp.float64)
        h_i = jnp.asarray(rng.randn(b, m), jnp.float64)
        rho = jnp.asarray(rng.uniform(0.5, 10.0, b))
        gw = jnp.asarray(rng.uniform(0.0, 1.0, b))
        nl = jnp.asarray(rng.uniform(0.0, 30.0, m))
        length, b_gamma = 9.0, 1.0 / (4 * np.pi)

        out_r, out_i = pk.gain_reduce(
            h_r, h_i, rho, gw, nl, length=length, b_gamma=b_gamma
        )

        eps = np.finfo(np.float64).eps
        arg = (np.pi / (2 * length)) * np.asarray(rho)[:, None] * np.asarray(nl)[None] + eps
        w = 4 * np.pi * b_gamma * np.asarray(gw)[:, None] * np.sin(arg) / arg
        ref_r = (w * np.asarray(h_r)).sum(0)
        ref_i = (w * np.asarray(h_i)).sum(0)
        scale = max(np.abs(ref_r).max(), np.abs(ref_i).max())
        np.testing.assert_allclose(np.asarray(out_r), ref_r, atol=1e-13 * scale)
        np.testing.assert_allclose(np.asarray(out_i), ref_i, atol=1e-13 * scale)


class TestAlphaMultiply:
    def test_matches_dense_product(self):
        rng = np.random.RandomState(1)
        b, n, m2 = 6, 8, 8 * 5
        ax = rng.randn(b, n) + 1j * rng.randn(b, n)
        ayz = rng.randn(b, m2) + 1j * rng.randn(b, m2)
        fh = rng.randn(n, m2) + 1j * rng.randn(n, m2)

        a1r, a1i, a2r, a2i = pk.alpha_multiply(
            jnp.asarray(ax.real), jnp.asarray(ax.imag),
            jnp.asarray(ayz.real), jnp.asarray(ayz.imag),
            jnp.asarray(fh.real), jnp.asarray(fh.imag),
        )
        alpha = ax[:, :, None] * ayz[:, None, :]
        a1 = alpha * fh[None]
        a2 = np.conj(alpha) * fh[None]
        np.testing.assert_allclose(np.asarray(a1r) + 1j * np.asarray(a1i), a1, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(a2r) + 1j * np.asarray(a2i), a2, rtol=1e-12)


class TestOperatorIntegration:
    def test_pallas_path_matches_jnp(self):
        cfg_p = bz.CollisionConfig(nv=16, ns=6, impl="rfft", use_pallas=True)
        cfg_j = bz.CollisionConfig(nv=16, ns=6, impl="rfft")
        coll_p, pre_p = bz.make_collision_operator(cfg_p)
        coll_j, pre_j = bz.make_collision_operator(cfg_j)
        f = bz.bkw_f(cfg_p.velocity_grid.r_squared(), 6.5)
        qp = np.asarray(coll_p(f, pre_p))
        qj = np.asarray(coll_j(f, pre_j))
        np.testing.assert_allclose(qp, qj, atol=1e-13 * np.abs(qj).max())

    def test_pallas_requires_rfft(self):
        with pytest.raises(ValueError):
            bz.CollisionConfig(impl="c2c", use_pallas=True)
