"""Ozaki-scheme sliced contraction: ds-accuracy matmuls ON the MXU.

The compensated (double-single) pipeline's cost is its contraction — ds
rank-1 updates on the VPU cost ~300 flops per output element per contraction
step because the MXU's f32 accumulator is exactly the precision being escaped
(:mod:`boltzfft.ds`).  This module puts the contraction back on the MXU
without giving up the ~49-bit accuracy, using the Ozaki splitting idea
(error-free matrix multiplication via mantissa slicing, Ozaki et al. 2012;
the same scheme used to get f64-class GEMM out of f16 tensor cores):

* every ds value is split into ``w``-bit mantissa chunks aligned to a
  per-row power-of-two scale.  Each chunk is an integer multiple of a shared
  unit, bounded by ``2^w`` — hence **exactly representable in bfloat16**
  (8 mantissa bits) and fed to the MXU at full bf16 rate;
* a chunk-pair product is an integer of at most ``2w`` bits times a shared
  power-of-two unit; summing ``K`` of them grows it by ``log2 K`` bits.  With
  ``w = 7`` and ``K <= 128`` every slice-pair dot product fits the MXU's
  24-bit f32 accumulator **without rounding** — the matmuls are exact;
* the few slice-pair results (those with slice-index sum ``i + j <= cmax``)
  are recombined smallest-scale-last with compensated (two_sum) adds on the
  VPU — O(output) work instead of the old O(output * K).

Truncation error is ``~2^-w(cmax+2)`` relative to the row magnitude, i.e.
ds-class (~2^-49) at the default ``w=7, cmax=7``, while the arithmetic runs
as ``O(cmax^2/2)`` bf16 matmuls.  This is the TPU-native answer to "the
reference links cuTensor but never uses it" (``CUDABoltzmannOperator.cu:
180-188``) taken one step further: the tensor-core contraction at beyond-
hardware precision.

Used by :func:`boltzfft.ds_operator.collide_ds` via ``contract="oz"``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ds
from .ds import CDS, DS, two_sum, quick_two_sum, _opaque

DEFAULT_W = 7  # chunk width (bits); 7 keeps depth-128 dots + 8-term level sums exact
DEFAULT_SLICES_X = 7  # 49 bits — all of an f32 ds pair
DEFAULT_SLICES_M = 8  # 56 bits — covers a full f64 table entry
DEFAULT_CMAX = 7  # keep slice pairs with i + j <= cmax


class CSlicedMatrix(NamedTuple):
    """A (K, L) complex matrix as bf16 mantissa slices (host-split from f64).

    ``re``/``im``: (nslices, K, L) bfloat16; slice ``j`` holds the ``w``-bit
    mantissa chunk at scale ``sigma * 2^{-w(j+1)}`` (true values — the slices
    sum to the matrix).  The chunk width ``w`` is NOT carried here (it would
    become a traced pytree leaf under jit); all splitters/contractors share
    ``DEFAULT_W`` unless explicitly overridden.
    """

    re: jnp.ndarray
    im: jnp.ndarray


def _host_slices(m: np.ndarray, nslices: int, w: int) -> np.ndarray:
    """Split a real f64 matrix into w-bit chunks of a global pow-2 scale."""
    m = np.asarray(m, np.float64)
    amax = float(np.max(np.abs(m))) if m.size else 0.0
    sigma = 2.0 ** np.ceil(np.log2(amax)) if amax > 0 else 1.0
    r = m.copy()
    out = np.empty((nslices,) + m.shape, np.float32)
    for j in range(nslices):
        u = sigma * 2.0 ** (-w * (j + 1))
        c = np.round(r / u) * u  # multiple of u, |c/u| <= 2^w: bf16-exact
        out[j] = c
        r -= c
    return out


def slice_matrix(
    m: np.ndarray, nslices: int = DEFAULT_SLICES_M, w: int = DEFAULT_W
) -> CSlicedMatrix:
    """Host-split a complex (or real) f64 matrix for :func:`contract_last_oz`."""
    m = np.asarray(m)
    return CSlicedMatrix(
        re=jnp.asarray(_host_slices(m.real, nslices, w), jnp.bfloat16),
        im=jnp.asarray(_host_slices(m.imag, nslices, w), jnp.bfloat16),
    )


def _pow2_ceil(a: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= a (elementwise, a >= 0), via exponent bits.

    Exponent is clamped into the normal range so the extraction constants
    derived from it stay normal: an all-zero row yields all-zero slices
    through the clamp (the chunks round to zero), not NaNs.
    """
    bits = jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)
    exp = (bits >> 23) & 0xFF
    exp = jnp.clip(exp + 1, 64, 254)
    return jax.lax.bitcast_convert_type(exp << 23, jnp.float32)


def slice_ds_last(
    x: DS, nslices: int = DEFAULT_SLICES_X, w: int = DEFAULT_W
) -> jnp.ndarray:
    """Split a ds array into bf16 chunks, scaled per row of the LAST axis.

    Returns (nslices, *x.shape) bfloat16 true-value chunks; chunk ``i`` is an
    integer multiple of ``sigma_row * 2^{-w(i+1)}`` bounded by ``2^w`` times
    that unit.  Extraction is the classical shift trick (add/subtract a
    mid-binade constant whose ulp is the chunk unit) with every rounded
    intermediate pinned via ``lax.reduce_precision`` — the same discipline as
    :mod:`boltzfft.ds`, without which XLA's fusion duplication voids the
    error-free algebra.  The residual after ``nslices`` chunks is
    ``<= sigma * 2^{-w*nslices}`` — for the default 7x7 bits that is every
    bit an f32 pair carries.
    """
    hi = x.hi.astype(jnp.float32)
    lo = x.lo.astype(jnp.float32)
    sigma = _pow2_ceil(jnp.max(jnp.abs(hi), axis=-1, keepdims=True))
    out = []
    r_hi, r_lo = hi, lo
    for i in range(nslices):
        # mid-binade constant: ulp(m_i) = sigma * 2^{-w(i+1)} = the chunk unit
        m_i = (1.5 * 2.0 ** (23 - w * (i + 1))) * sigma
        c = _opaque(_opaque(r_hi + m_i) - m_i)
        out.append(c.astype(jnp.bfloat16))
        r_hi = _opaque(r_hi - c)  # exact (Sterbenz-range subtraction)
        r_hi, r_lo = two_sum(r_hi, r_lo)  # fold low-word bits into range
    return jnp.stack(out)


def _level_dots(xs: jnp.ndarray, ms: jnp.ndarray, cmax: int) -> list:
    """Per-level exact dot sums: level d = sum_{i+j=d} xs[i] @ ms[j].

    Each pair dot is exact in the f32 accumulator (see module docstring);
    same-level results share a power-of-two unit and their (<= 8-term) sum
    stays under 24 bits, so the plain f32 adds here are exact too.
    """
    levels = []
    for d in range(cmax + 1):
        acc = None
        for i in range(min(d, xs.shape[0] - 1), -1, -1):
            j = d - i
            if j >= ms.shape[0]:
                continue
            p = jnp.einsum(
                "...k,kl->...l",
                xs[i],
                ms[j],
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else _opaque(acc + p)
        if acc is not None:
            levels.append(acc)
    return levels


def _add_float(x: DS, a: jnp.ndarray) -> DS:
    """ds += plain float (9 flops)."""
    s, e = two_sum(x.hi, a)
    s, e = quick_two_sum(s, e + x.lo)
    return DS(s, e)


def _fold_levels(a: list, b: list, sign_b: float) -> DS:
    """Compensated sum ``sum(a) + sign_b * sum(b)`` of exact f32 level
    arrays, folded largest-scale-first (level d is ~2^-w of level d-1)."""
    acc = None
    for d in range(max(len(a), len(b))):
        for arr, sgn in ((a, 1.0), (b, sign_b)):
            if d < len(arr):
                t = arr[d] if sgn > 0 else -arr[d]
                acc = DS(t, jnp.zeros_like(t)) if acc is None else _add_float(acc, t)
    return acc


def contract_last_oz(
    x: CDS, m: CSlicedMatrix, cmax: int = DEFAULT_CMAX, w: int = DEFAULT_W
) -> CDS:
    """``out[..., l] = sum_k x[..., k] * m[k, l]`` — ds accuracy, MXU speed.

    Drop-in replacement for :func:`boltzfft.ds.contract_last` with the matrix
    pre-split by :func:`slice_matrix`.  ``4 * (cmax+1)(cmax+2)/2`` bf16
    matmuls + O(output) compensated recombination.
    """
    xr = slice_ds_last(x.re, w=w)
    xi = slice_ds_last(x.im, w=w)
    rr = _level_dots(xr, m.re, cmax)
    ii = _level_dots(xi, m.im, cmax)
    ri = _level_dots(xr, m.im, cmax)
    ir = _level_dots(xi, m.re, cmax)
    return CDS(_fold_levels(rr, ii, -1.0), _fold_levels(ri, ir, +1.0))


def transform3_oz(x: CDS, m: CSlicedMatrix, cmax: int = DEFAULT_CMAX) -> CDS:
    """Separable 3-D transform of the trailing (N, N, N) axes with the shared
    sliced (N, N) matrix — the MXU analog of :func:`boltzfft.ds.transform3`."""
    x = contract_last_oz(x, m, cmax)  # z
    x = ds._swap_last2(contract_last_oz(ds._swap_last2(x), m, cmax))  # y
    x = ds._roll_axis(
        contract_last_oz(ds._roll_axis(x, -3, -1), m, cmax), -1, -3
    )  # x
    return x
