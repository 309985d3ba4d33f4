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

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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


_UPLOAD_SLICE_BYTES = 8 << 20  # remote-TPU tunnels choke on huge one-shot H2D


def _upload_chunked(a: np.ndarray, dtype) -> jnp.ndarray:
    """H2D in bounded leading-axis slices (the ds_operator table pattern):
    at 96^3 a single per-node sliced table is ~170 MB, and one-shot
    transfers of that size can wedge the remote-accelerator transport."""
    a = np.ascontiguousarray(a)
    if a.ndim == 0 or a.nbytes <= _UPLOAD_SLICE_BYTES:
        return jnp.asarray(a, dtype)
    rows_per = max(1, _UPLOAD_SLICE_BYTES // max(1, a[0:1].nbytes))
    parts = [
        jnp.asarray(a[i : i + rows_per], dtype)
        for i in range(0, a.shape[0], rows_per)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def slice_matrix_nodes(
    m: np.ndarray, nslices: int = DEFAULT_SLICES_M, w: int = DEFAULT_W
) -> CSlicedMatrix:
    """Host-split a batch of per-node matrices ``(..., K, L)``.

    Returns slices with the slice axis INSIDE the batch axes —
    ``re/im: (..., nslices, K, L)`` — so the leading node axes stay leading
    (scannable / sub-batch sliceable).  One global power-of-two scale across
    the batch (the phase-folded matrices all share the base matrix's
    magnitude, so per-node scales would buy < 1 bit of the 56-bit depth)."""
    m = np.asarray(m)
    sl = lambda comp: np.moveaxis(_host_slices(comp, nslices, w), 0, -3)
    return CSlicedMatrix(
        re=_upload_chunked(sl(m.real), jnp.bfloat16),
        im=_upload_chunked(sl(m.imag), jnp.bfloat16),
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
    x: CDS, m: CSlicedMatrix, cmax: int = DEFAULT_CMAX, w: int = DEFAULT_W,
    real_in: bool = False, real_out: bool = False,
    fold_tail: Optional[int] = None,
) -> CDS:
    """``out[..., l] = sum_k x[..., k] * m[k, l]`` — ds accuracy, MXU speed.

    Drop-in replacement for :func:`boltzfft.ds.contract_last` with the matrix
    pre-split by :func:`slice_matrix`.  ``4 * (cmax+1)(cmax+2)/2`` bf16
    matmuls + O(output) compensated recombination.  ``real_in`` treats the
    imaginary input plane as exactly zero (half the slicing + dots);
    ``real_out`` skips the imaginary output (returned as zeros).
    """
    xr = slice_ds_last(x.re, w=w)
    rr = _level_dots(xr, m.re, cmax)
    ri = None if real_out else _level_dots(xr, m.im, cmax)
    if real_in:
        ii, ir = [], []
    else:
        xi = slice_ds_last(x.im, w=w)
        ii = _level_dots(xi, m.im, cmax)
        ir = [] if real_out else _level_dots(xi, m.re, cmax)
    if fold_tail is not None:
        # collapse levels >= fold_tail with plain f32 adds before the
        # compensated fold (see contract_last_oz_kernel's fold_tail note)
        def collapse(levels):
            ft = max(1, fold_tail)
            if levels is None or len(levels) <= ft + 1:
                return levels
            tail = levels[ft]
            for t in levels[ft + 1:]:
                tail = _opaque(tail + t)
            return levels[:ft] + [tail]

        rr, ri, ii, ir = (collapse(v) for v in (rr, ri, ii, ir))
    re = _fold_levels(rr, ii, -1.0)
    if real_out:
        z = ds.DS(jnp.zeros_like(re.hi), jnp.zeros_like(re.lo))
        return CDS(re, z)
    return CDS(re, _fold_levels(ri, ir, +1.0))


# --------------------------------------------------------------------------
# the fused Pallas kernel: slice -> 4*levels matmuls -> compensated fold, all
# VMEM-resident.  The staged XLA version above materializes ~150 intermediate
# arrays per contraction in HBM (measured bandwidth-bound); the kernel's
# traffic is one x read + one ds out write.
#
# The error-free transformations run WITHOUT the reduce_precision pinning
# that :mod:`boltzfft.ds` needs under XLA when lowered through Mosaic:
# reduce_precision does not lower there, and it is also not needed — Mosaic
# emits the vector ops as written (no duplicating fusion), and the
# extraction/two_sum sequences contain no multiply for an FMA rewrite to
# contract.  In INTERPRET mode, however, the kernel body is ordinary XLA:CPU
# code (and inside jit/scan it fuses like any other), so there the pinning
# IS required — unpinned, a scanned pipeline measurably collapses to ~1e-6.
# Hence the ``pin`` switch: True off-TPU, False under Mosaic.  The
# kernel-vs-staged equivalence is asserted in the test suite.
# --------------------------------------------------------------------------


_SPLIT_F32 = float(2 ** 12 + 1)  # Dekker split constant for f32


def _k_mul(ah, al, bh, bl, opq):
    """In-kernel ds multiply (same algebra as ds.mul; opq pins off-Mosaic)."""
    p = opq(ah * bh)
    c = opq(ah * _SPLIT_F32)
    h1 = opq(c - (c - ah))
    l1 = ah - h1
    c = opq(bh * _SPLIT_F32)
    h2 = opq(c - (c - bh))
    l2 = bh - h2
    e = ((h1 * h2 - p) + h1 * l2 + l1 * h2) + l1 * l2
    e = e + (ah * bl + al * bh)
    sHi = opq(p + e)
    return sHi, e - (sHi - p)


def _k_ds_add(ah, al, bh, bl, opq):
    """In-kernel ds add (ds.add algebra)."""
    s0, e = _k_two_sum(ah, bh, opq)
    e = e + (al + bl)
    s1 = opq(s0 + e)
    return s1, e - (s1 - s0)


def _k_ds_sub(ah, al, bh, bl, opq):
    return _k_ds_add(ah, al, -bh, -bl, opq)


def _phase_sigma(a_hi):
    """Rowwise strictly-greater power-of-two scale, via exp2/log2 (shared by
    the Mosaic kernel and the jnp twin so both slice with identical scales;
    matches _pow2_ceil's exponent+1 semantics up to log2 rounding at exact
    powers of two — a ds-noise-level difference)."""
    a = jnp.max(jnp.abs(a_hi), axis=-1, keepdims=True)
    return jnp.where(
        a > 0.0, jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(a, 1e-38))) + 1.0), 1.0
    )


def _k_phase_cmul(xr, xi, ph, conj, opq):
    """t = phase * x (or conj(phase) * x) in full ds arithmetic.

    ``xr``/``xi`` are (hi, lo) pairs of the input component planes; ``ph`` is
    ((pr_hi, pr_lo), (pi_hi, pi_lo)) broadcastable against them."""
    (prh, prl), (pih, pil) = ph
    if conj:
        pih, pil = -pih, -pil
    rr = _k_mul(prh, prl, xr[0], xr[1], opq)
    ii = _k_mul(pih, pil, xi[0], xi[1], opq)
    ri = _k_mul(prh, prl, xi[0], xi[1], opq)
    ir = _k_mul(pih, pil, xr[0], xr[1], opq)
    tre = _k_ds_sub(rr[0], rr[1], ii[0], ii[1], opq)
    tim = _k_ds_add(ri[0], ri[1], ir[0], ir[1], opq)
    return tre, tim


def _k_two_sum(a, b, opq):
    s = opq(a + b)
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _k_add_float(hi, lo, p, opq):
    """(hi, lo) ds += plain f32 p (in-kernel)."""
    s, e = _k_two_sum(hi, p, opq)
    e = e + lo
    s2 = opq(s + e)
    return s2, e - (s2 - s)


# Kernel dot layout history (all variants compute identical exact level sums
# — products within a level share a power-of-two unit, so accumulation order
# cannot round — and run the same fold sequence, so results are bit-identical;
# only the MXU shapes differ):
#   v1: one dot per (i, j) slice pair — measured ~2% of bf16 peak.
#   v2: chunks sublane-stacked, matrix slices lane-stacked — one (sx*rb, K) @
#       (K, sm*L) dot per component pair.  K = N = 64 pads to the 128-wide
#       MXU: ds-oz 64^3 measured 3.77 evals/s.
#   v3: chunks lane-concatenated, matrix as a block-Toeplitz stack
#       (see _toeplitz_mats) so each Ozaki level is one column block of a
#       two-dot (split=4 low / sx high) pass: 4.24 evals/s, bit-identical
#       to v2.
#   v4 (current, round 4): staircase level groups — one dot per pair of
#       levels at the chunk-prefix depth that can reach them
#       (_level_groups).  31 chunk-level MAC units at cmax=6 vs v3's 37
#       (the zero Toeplitz blocks shrink), and the kernel fetches ONE chunk
#       concatenation instead of v3's lo+all pair.  Bit-identical to v2/v3.

#: Staircase level-group width: levels are grouped in pairs and group g's
#: dot contracts only the chunk prefix that can reach its levels
#: (``n = min(d1, sx_eff)``).  At cmax=6/sx=7 this runs 31 chunk-level MAC
#: units where the old two-dot (lo/hi) split ran 37 and the v2 full tile
#: ran 56 — the zero Toeplitz blocks shrink with the staircase.  2 balances
#: MAC waste (half a chunk block per group) against per-dot overhead.
_GROUP_LEVELS = 2


def _level_groups(nlev: int, sx_eff: int):
    """Staircase partition of the fold levels: ``((d0, d1, n_chunks), ...)``.

    Group ``[d0, d1)`` contracts chunk prefix ``0..n_chunks-1`` — the only
    chunks that can contribute to levels below ``d1`` (pair (i, j) feeds
    level ``i + j``, so level d needs ``i <= d``)."""
    groups = []
    d0 = 0
    while d0 < nlev:
        d1 = min(d0 + _GROUP_LEVELS, nlev)
        groups.append((d0, d1, min(d1, sx_eff)))
        d0 = d1
    return tuple(groups)


def _toeplitz_mats(m: CSlicedMatrix, sx: int, cmax: int):
    """Block-Toeplitz lane layouts for the v3 kernel's staircase dots.

    For each level group ``(d0, d1, n)`` (see :func:`_level_groups`) build
    ``B[i*K:(i+1)*K, (d-d0)*L:(d-d0+1)*L] = m[d - i]`` (zero block when out
    of range) over chunks ``i < n``: a dot of the lane-concatenated chunk
    prefix ``[x_0 .. x_{n-1}]`` against ``B`` yields every retained level
    ``d`` in ``[d0, d1)`` as a column block — the same exact pair sums the
    v2 tile loop assembles (products within a level share a power-of-two
    unit, so any dot partitioning gives bit-identical level values).
    Returns ``(sx_eff, groups, [(b_re, b_im), ...])`` with one matrix pair
    per group.

    ``m`` may carry leading node axes (``slice_matrix_nodes`` layout,
    ``(..., sm, K, L)``): the Toeplitz assembly then applies per node and the
    outputs keep the leading axes.
    """
    sm, k, ell = m.re.shape[-3:]
    lead = m.re.shape[:-3]
    nlev = cmax + 1
    sx_eff = min(sx, nlev)  # chunks with i > cmax never reach the fold
    groups = _level_groups(nlev, sx_eff)

    def build(comp, n_i, d0, d1):
        zero = jnp.zeros(lead + (k, ell), comp.dtype)
        rows = [
            jnp.concatenate(
                [
                    comp[..., d - i, :, :] if 0 <= d - i < sm else zero
                    for d in range(d0, d1)
                ],
                axis=-1,
            )
            for i in range(n_i)
        ]
        return jnp.concatenate(rows, axis=-2)

    mats = [
        (build(m.re, n, d0, d1), build(m.im, n, d0, d1))
        for (d0, d1, n) in groups
    ]
    return sx_eff, groups, mats


class PreslicedCDS(NamedTuple):
    """Lane-concatenated bf16 mantissa chunks of a flattened CDS operand.

    ``all_*`` holds all ``sx`` chunks, ``(rows, sx*K)`` with the chunk index
    on lanes; the staircase kernel slices the per-group prefixes from it
    in-register.  Produced once per eval by :func:`preslice_rows` for
    operands that many kernel launches share (the ds pipeline's f_hat:
    repeat-mode z-axis contractions otherwise re-slice the same spectrum
    in-kernel for every node x group x sub-batch x stream — ~3000 redundant
    row-block slicings per 64^3 eval)."""

    all_re: jnp.ndarray
    all_im: jnp.ndarray


class PreslicedM(NamedTuple):
    """K-MERGED presliced chunks (shared-scale ``[re_i | im_i]`` per chunk
    block — see :func:`_slice_rows_merged`); consumed by the merged kernel
    mode.  ``full``: all ``sx`` chunk blocks, ``(rows, sx*2K)``."""

    full: jnp.ndarray


def _slice_rows(hi, lo, sig, w, sx, opq):
    """The kernel's chunk extraction (see _oz_contract_kernel_v3.slices);
    shared by the in-kernel path, the preslice kernel, and the jnp twin so
    all three produce bit-identical chunks.  Returns the lane-concatenation
    of all ``sx`` chunks; staircase prefixes are in-register slices of it."""
    out = []
    r_hi, r_lo = hi, lo
    for i in range(sx):
        m_i = (1.5 * 2.0 ** (23 - w * (i + 1))) * sig
        c = opq(opq(r_hi + m_i) - m_i)
        out.append(c.astype(jnp.bfloat16))
        r_hi = opq(r_hi - c)  # exact
        r_hi, r_lo = _k_two_sum(r_hi, r_lo, opq)
    return jnp.concatenate(out, axis=1)


def _chunk_rows(hi, lo, sig, w, sx, opq):
    """Raw chunk list of _slice_rows (no concat) — the merged layout
    interleaves two components per chunk index before concatenating."""
    out = []
    r_hi, r_lo = hi, lo
    for i in range(sx):
        m_i = (1.5 * 2.0 ** (23 - w * (i + 1))) * sig
        c = opq(opq(r_hi + m_i) - m_i)
        out.append(c.astype(jnp.bfloat16))
        r_hi = opq(r_hi - c)  # exact
        r_hi, r_lo = _k_two_sum(r_hi, r_lo, opq)
    return out


def _slice_rows_merged(rh, rl, ih, il, sig, w, sx, opq):
    """Chunk extraction for the K-MERGED complex contraction: both
    components sliced with the SHARED per-row scale ``sig`` and
    lane-concatenated PER CHUNK INDEX — chunk block ``i`` is
    ``[re_i | im_i]`` (2K lanes), matching :func:`_toeplitz_mats_merged`'s
    K-concatenated matrix rows.  Returns the full ``sx``-block
    concatenation; staircase prefixes are in-register slices of it."""
    cr = _chunk_rows(rh, rl, sig, w, sx, opq)
    ci = _chunk_rows(ih, il, sig, w, sx, opq)
    return jnp.concatenate(
        [jnp.concatenate((cr[i], ci[i]), axis=1) for i in range(sx)], axis=1
    )


def merge_ok(k: int, sx: int = DEFAULT_SLICES_X, sm=None,
             cmax: int = DEFAULT_CMAX, w: int = DEFAULT_W) -> bool:
    """Whether the K-merged complex contraction stays exact at depth ``k``.

    The merged level-``d`` dot accumulates ``2k * pairs(d)`` nonzero
    products of two w-bit integers in one f32 accumulator; exactness needs
    every partial sum <= 2^24, i.e. ``2k * max_pairs * 2^(2w) <= 2^24``.
    At the default w=7: ``2k * max_pairs <= 1024`` — true for the ds
    pipeline's K <= 73 at cmax=6 (all 64^3-and-below grids; the z-half
    stage merges up to Nz=144)."""
    if sm is None:
        sm = DEFAULT_SLICES_M
    pairs = min(cmax + 1, min(sx, cmax + 1), sm)
    return 2 * k * pairs * (1 << (2 * w)) <= (1 << 24)


def _toeplitz_mats_merged(m: CSlicedMatrix, sx: int, cmax: int):
    """Block-Toeplitz stacks for the K-merged complex contraction.

    The real-output group contracts ``[re_i | im_i]`` chunks against
    K-concatenated slices ``[M_re; -M_im]``; the imaginary group against
    ``[M_im; M_re]`` — so each merged dot yields the full complex
    combination of a level in ONE f32 accumulation (exact under
    :func:`merge_ok`), and the compensated fold runs 2 level lists
    instead of 4.  Negation of bf16 slices is exact.  Returns the same
    structure as :func:`_toeplitz_mats` (the "re"/"im" stacks are the
    merged real/imag OUTPUT stacks); XLA dead-code-eliminates the im
    stacks when a real_out kernel never consumes them."""
    mre = jnp.concatenate((m.re, -m.im), axis=-2)
    mim = jnp.concatenate((m.im, m.re), axis=-2)
    return _toeplitz_mats(CSlicedMatrix(re=mre, im=mim), sx, cmax)


def _preslice_kernel(xrh, xrl, xih, xil, oall_r, oall_i, *, w, sx):
    opq = lambda v: v  # Mosaic emits EFTs as written
    oall_r[:] = _slice_rows(xrh[:], xrl[:], _phase_sigma(xrh[:]), w, sx, opq)
    oall_i[:] = _slice_rows(xih[:], xil[:], _phase_sigma(xih[:]), w, sx, opq)


def _preslice_kernel_merged(xrh, xrl, xih, xil, oall, *, w, sx):
    opq = lambda v: v  # Mosaic emits EFTs as written
    sig = jnp.maximum(_phase_sigma(xrh[:]), _phase_sigma(xih[:]))
    oall[:] = _slice_rows_merged(
        xrh[:], xrl[:], xih[:], xil[:], sig, w, sx, opq
    )


def preslice_rows(
    x: CDS, cmax: int = DEFAULT_CMAX, w: int = DEFAULT_W,
    interpret: Optional[bool] = None, merged: bool = False,
):
    """Extract the v3 kernel's bf16 chunk operands once, outside the kernel.

    Chunks are a deterministic per-row function (scale from
    :func:`_phase_sigma`, extraction from :func:`_slice_rows`), so a kernel
    consuming these via ``x_pre`` is bit-identical to one slicing in-kernel.
    ``x`` may have any leading shape; rows are the flattened leading axes.
    ``merged=True`` produces the K-merged shared-scale layout
    (:class:`PreslicedM`) for the merged kernel mode instead.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = x.re.hi.shape[-1]
    nlev = cmax + 1
    sx_eff = min(DEFAULT_SLICES_X, nlev)
    flat = lambda a: a.reshape(-1, k).astype(jnp.float32)
    xrh, xrl = flat(x.re.hi), flat(x.re.lo)
    xih, xil = flat(x.im.hi), flat(x.im.lo)
    if interpret:
        if merged:
            sig = jnp.maximum(_phase_sigma(xrh), _phase_sigma(xih))
            return PreslicedM(
                _slice_rows_merged(xrh, xrl, xih, xil, sig, w, sx_eff, _opaque)
            )
        return PreslicedCDS(
            _slice_rows(xrh, xrl, _phase_sigma(xrh), w, sx_eff, _opaque),
            _slice_rows(xih, xil, _phase_sigma(xih), w, sx_eff, _opaque),
        )
    rows = xrh.shape[0]
    rb = _row_block(rows)
    spec_in = pl.BlockSpec((rb, k), lambda i: (i, 0))
    widths = (sx_eff * 2,) if merged else (sx_eff, sx_eff)
    outs = [
        jax.ShapeDtypeStruct((rows, n * k), jnp.bfloat16) for n in widths
    ]
    out_specs = [
        pl.BlockSpec((rb, n * k), lambda i: (i, 0)) for n in widths
    ]
    kern = (
        partial(_preslice_kernel_merged, w=w, sx=sx_eff)
        if merged
        else partial(_preslice_kernel, w=w, sx=sx_eff)
    )
    res = pl.pallas_call(
        kern,
        grid=(rows // rb,),
        in_specs=[spec_in] * 4,
        out_specs=out_specs,
        out_shape=outs,
        interpret=False,
    )(xrh, xrl, xih, xil)
    return PreslicedM(*res) if merged else PreslicedCDS(*res)


def _oz_contract_kernel_v3(
    *refs, w, sx, groups, ell, nlev, sm, pin, real_in=False, real_out=False,
    phase=False, conj=False, node_mats=False, fold_tail=None,
    presliced=False, merged=False,
):
    """v3 layout: chunks lane-concatenated, block-Toeplitz staircase dots
    (see :func:`_level_groups`/:func:`_toeplitz_mats`).  Same slice
    extraction, same exact level values, same compensated fold order as
    v2 — bit-identical outputs; only the dot partitioning (and hence the
    zero-block MAC waste) differs.

    ``groups`` is the static staircase ``((d0, d1, n_chunks), ...)``; the
    matrix refs arrive as one Toeplitz stack per (level group x component).
    Chunk prefixes are in-register lane slices of the full concatenation
    (offset 0, so no relayout is required).

    ``merged=True`` (K-merged complex contraction, gated by
    :func:`merge_ok`): chunks arrive/are extracted in the
    ``[re_i | im_i]`` shared-scale layout and the matrices are the
    :func:`_toeplitz_mats_merged` K-concatenated stacks, so each level dot
    yields a full complex combination in one exact f32 accumulation — the
    compensated fold runs 2 level lists instead of 4 (the fold is the
    kernel's VPU bound; measured in docs/PERFORMANCE.md round 4)."""
    n_groups = len(groups)
    mat = (lambda r: r[0]) if node_mats else (lambda r: r[:])
    if merged:
        # real_out passes ONLY the re-output stacks (the im stacks would be
        # fetched into VMEM per grid step just to be ignored)
        n_mats = n_groups * (1 if real_out else 2)
        if presliced:
            (call_ref,) = refs[:1]
            mats = refs[1:1 + n_mats]
            outs = refs[1 + n_mats:]
        else:
            (xrh_ref, xrl_ref, xih_ref, xil_ref) = refs[:4]
            mats = refs[4:4 + n_mats]
            outs = refs[4 + n_mats:]
        # mats order: [g0_re, g1_re, ...] then [g0_im, ...] when complex out
        mre = mats[:n_groups]
        mim = None if real_out else mats[n_groups:]
        if real_out:
            orh_ref, orl_ref = outs
            oih_ref = oil_ref = None
        else:
            orh_ref, orl_ref, oih_ref, oil_ref = outs
        rb = (call_ref if presliced else xrh_ref).shape[0]
        opq = _opaque if pin else (lambda v: v)
        if presliced:
            c_full = call_ref[:]
            blk = c_full.shape[1] // sx
            prefix = lambda n: c_full[:, : n * blk]
        else:
            sig = jnp.maximum(
                _phase_sigma(xrh_ref[:]), _phase_sigma(xih_ref[:])
            )
            prefix = _merged_prefix_planes(
                xrh_ref[:], xrl_ref[:], xih_ref[:], xil_ref[:], w, sx, opq
            )
        reh = rel = imh = iml = jnp.zeros((rb, ell), jnp.float32)
        out_groups = [(mre, 1.0, "re")]
        if not real_out:
            out_groups.append((mim, 1.0, "im"))
        n_fold = min(nlev, sx + sm - 1)
        ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))
        for mats_g, sgn, which in out_groups:
            tail = None
            for gi, (d0, d1, n) in enumerate(groups):
                if d0 >= n_fold:
                    break
                p = jnp.dot(
                    prefix(n), mat(mats_g[gi]),
                    preferred_element_type=jnp.float32,
                )
                for d in range(d0, min(d1, n_fold)):
                    acc = p[:, (d - d0) * ell:(d - d0 + 1) * ell]
                    if d >= ft:
                        tail = acc if tail is None else opq(tail + acc)
                        continue
                    if which == "re":
                        reh, rel = _k_add_float(reh, rel, acc, opq)
                    else:
                        imh, iml = _k_add_float(imh, iml, acc, opq)
            if tail is not None:
                if which == "re":
                    reh, rel = _k_add_float(reh, rel, tail, opq)
                else:
                    imh, iml = _k_add_float(imh, iml, tail, opq)
        orh_ref[:] = reh
        orl_ref[:] = rel
        if not real_out:
            oih_ref[:] = imh
            oil_ref[:] = iml
        return
    n_mats = 2 * n_groups
    if presliced:
        # chunk operands arrive pre-extracted (preslice_rows): no slicing,
        # no sigma — the kernel is dots + fold only
        (crall_ref, ciall_ref) = refs[:2]
        mats = refs[2:2 + n_mats]
        outs = refs[2 + n_mats:]
        sr_ref = si_ref = None
        xrh_ref = crall_ref  # rb source below
    elif node_mats:
        # per-node-matrix mode: slicing scales computed in-kernel (an extra
        # HBM pass to precompute them costs more than the VPU row-max here)
        (xrh_ref, xrl_ref, xih_ref, xil_ref) = refs[:4]
        mats = refs[4:4 + n_mats]
        outs = refs[4 + n_mats:]
        sr_ref = si_ref = None
    elif phase:
        (xrh_ref, xrl_ref, xih_ref, xil_ref,
         prh_ref, prl_ref, pih_ref, pil_ref) = refs[:8]
        mats = refs[8:8 + n_mats]
        outs = refs[8 + n_mats:]
        sr_ref = si_ref = None
    elif real_in:
        # plain modes compute sigma in-kernel too (round-3 measurement: an
        # external sigma pass costs more than the VPU row-max)
        (xrh_ref, xrl_ref) = refs[:2]
        mats = refs[2:2 + n_mats]
        outs = refs[2 + n_mats:]
        sr_ref = si_ref = xih_ref = xil_ref = None
    else:
        (xrh_ref, xrl_ref, xih_ref, xil_ref) = refs[:4]
        mats = refs[4:4 + n_mats]
        outs = refs[4 + n_mats:]
        sr_ref = si_ref = None
    # mats order: [g0_re, g1_re, ...] then [g0_im, g1_im, ...]
    mre, mim = mats[:n_groups], mats[n_groups:]
    if real_out:
        # the imaginary output planes are never computed — don't declare
        # (or write) them: at 64^3 the zero-writes alone are ~8 MB/launch
        orh_ref, orl_ref = outs
        oih_ref = oil_ref = None
    else:
        orh_ref, orl_ref, oih_ref, oil_ref = outs
    rb = xrh_ref.shape[0]
    opq = _opaque if pin else (lambda v: v)

    # chunk prefixes: group g contracts chunks i < n_g only (shared
    # extraction _chunk_rows — also the preslice kernel, so presliced mode
    # is bit-identical).  The full lane concatenation is built once; group
    # prefixes are offset-0 slices (no per-group re-concatenation).
    def prefix_fn(chunk_list):
        full = jnp.concatenate(chunk_list, axis=1)
        blk = full.shape[1] // sx
        return lambda n: full[:, : n * blk]

    clist = lambda hi, lo, sig: _chunk_rows(hi, lo, sig, w, sx, opq)

    if presliced:
        c_r, c_i = crall_ref[:], ciall_ref[:]
        blk = c_r.shape[1] // sx
        cr = lambda n: c_r[:, : n * blk]
        ci = lambda n: c_i[:, : n * blk]
    elif node_mats:
        cr = prefix_fn(clist(xrh_ref[:], xrl_ref[:], _phase_sigma(xrh_ref[:])))
        ci = prefix_fn(clist(xih_ref[:], xil_ref[:], _phase_sigma(xih_ref[:])))
    elif phase:
        ph = (
            (prh_ref[0:1, :], prl_ref[0:1, :]),
            (pih_ref[0:1, :], pil_ref[0:1, :]),
        )
        tre, tim = _k_phase_cmul(
            (xrh_ref[:], xrl_ref[:]), (xih_ref[:], xil_ref[:]), ph, conj, opq
        )
        cr = prefix_fn(clist(tre[0], tre[1], _phase_sigma(tre[0])))
        ci = prefix_fn(clist(tim[0], tim[1], _phase_sigma(tim[0])))
    else:
        cr = prefix_fn(clist(xrh_ref[:], xrl_ref[:], _phase_sigma(xrh_ref[:])))
        ci = (
            None
            if real_in
            else prefix_fn(
                clist(xih_ref[:], xil_ref[:], _phase_sigma(xih_ref[:]))
            )
        )

    reh = rel = imh = iml = jnp.zeros((rb, ell), jnp.float32)
    comb = [(cr, mre, 1.0, "re")]
    if not real_in:
        comb.append((ci, mim, -1.0, "re"))
    if not real_out:
        comb.append((cr, mim, 1.0, "im"))
        if not real_in:
            comb.append((ci, mre, 1.0, "im"))
    n_fold = min(nlev, sx + sm - 1)  # levels past sx+sm-2 have no pairs
    # Levels >= fold_tail are pre-summed in plain f32 before ONE compensated
    # fold: level d is ~2^-wd of level 0, so the pre-sum rounding is bounded
    # by ~2^{-24-w*fold_tail} of the level-0 scale — below the ds noise floor
    # (2^-49) whenever w*fold_tail >= 32.  None = all-ds (exact capture).
    ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))
    for chunks, mats_g, sgn, which in comb:
        tail = None
        for gi, (d0, d1, n) in enumerate(groups):
            if d0 >= n_fold:
                break
            p = jnp.dot(
                chunks(n), mat(mats_g[gi]),
                preferred_element_type=jnp.float32,
            )
            for d in range(d0, min(d1, n_fold)):
                acc = p[:, (d - d0) * ell:(d - d0 + 1) * ell]
                if d >= ft:
                    tail = acc if tail is None else opq(tail + acc)
                    continue
                if sgn < 0:
                    acc = -acc
                if which == "re":
                    reh, rel = _k_add_float(reh, rel, acc, opq)
                else:
                    imh, iml = _k_add_float(imh, iml, acc, opq)
        if tail is not None:
            if sgn < 0:
                tail = -tail
            if which == "re":
                reh, rel = _k_add_float(reh, rel, tail, opq)
            else:
                imh, iml = _k_add_float(imh, iml, tail, opq)
    orh_ref[:] = reh
    orl_ref[:] = rel
    if not real_out:
        oih_ref[:] = imh
        oil_ref[:] = iml


def _row_block(rows: int) -> int:
    # bounded by the (sx*rb, sm*L) product array in VMEM (~7.3 MB at 512)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return rows


def _row_block_in_node(rows_per_node: int) -> int:
    """Row block that never straddles a node boundary (phase mode: each
    block reads exactly one node's phase row)."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows_per_node % cand == 0:
            return cand
    return rows_per_node


def _oz_contract_v2_jnp(
    sig_r, sig_i, xrh, xrl, xih, xil, m_re, m_im, *, w, sx, sm, ell, cmax,
    real_in=False, real_out=False, fold_tail=None,
):
    """Pure-jnp twin of ``_oz_contract_kernel_v3`` for non-TPU backends.

    Same math, explicit f32 dots (exact for the chunk values by
    construction), EFT intermediates pinned.  This is the interpret path:
    running the Mosaic kernel body through ``pallas_call(interpret=True)``
    inside a larger jit/scan lets XLA:CPU fuse the emulated bf16 dot into a
    reduced-precision form and the exactness argument dies (measured: a
    scanned pipeline collapses to ~1e-7 while the same ops run eagerly are
    exact) — the twin keeps the dot in f32 where CPU accumulation is exact.
    Bit-identical to the Mosaic kernel: both compute exact integer-valued
    slice products and the same fold sequence.
    """
    rows = xrh.shape[0]

    def slices(hi, lo, sig):
        out = []
        r_hi, r_lo = hi, lo
        for i in range(sx):
            m_i = (1.5 * 2.0 ** (23 - w * (i + 1))) * sig
            c = _opaque(_opaque(r_hi + m_i) - m_i)
            out.append(c)
            r_hi = _opaque(r_hi - c)
            r_hi, r_lo = two_sum(r_hi, r_lo)
        return jnp.stack(out)  # (sx, rows, K) f32 (bf16-exact values)

    cr = slices(xrh, xrl, sig_r)
    ci = None if real_in else slices(xih, xil, sig_i)
    m_re32 = m_re.astype(jnp.float32)  # (sm, K, ell)
    m_im32 = m_im.astype(jnp.float32)

    reh = rel = jnp.zeros((rows, ell), jnp.float32)
    imh = iml = jnp.zeros((rows, ell), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    groups = [(cr, m_re32, 1.0, "re")]
    if not real_in:
        groups.append((ci, m_im32, -1.0, "re"))
    if not real_out:
        groups.append((cr, m_im32, 1.0, "im"))
        if not real_in:
            groups.append((ci, m_re32, 1.0, "im"))
    n_fold = min(cmax + 1, sx + sm - 1)
    ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))
    for chunks, mat, sgn, which in groups:
        tail = None
        for d in range(n_fold):
            acc = None
            for i in range(min(d, sx - 1), -1, -1):
                j = d - i
                if j >= sm:
                    continue
                t = jnp.dot(
                    chunks[i], mat[j],
                    precision=hp, preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else _opaque(acc + t)
            if acc is None:
                continue
            if d >= ft:
                tail = acc if tail is None else _opaque(tail + acc)
                continue
            if sgn < 0:
                acc = -acc
            if which == "re":
                s, e = two_sum(reh, acc)
                reh, rel = quick_two_sum(s, e + rel)
            else:
                s, e = two_sum(imh, acc)
                imh, iml = quick_two_sum(s, e + iml)
        if tail is not None:
            if sgn < 0:
                tail = -tail
            if which == "re":
                s, e = two_sum(reh, tail)
                reh, rel = quick_two_sum(s, e + rel)
            else:
                s, e = two_sum(imh, tail)
                imh, iml = quick_two_sum(s, e + iml)
    return reh, rel, imh, iml


def _oz_contract_merged_jnp(
    sig, xrh, xrl, xih, xil, m_re, m_im, *, w, sx, sm, ell, cmax,
    real_out=False, fold_tail=None,
):
    """Pure-jnp twin of the kernel's MERGED mode (see
    ``_oz_contract_kernel_v3(merged=True)``).

    Both components are sliced with the shared per-row scale ``sig``; each
    level value is the full complex combination ``sum_i cr_i@A[d-i] +
    ci_i@B[d-i]`` with ``(A, B) = (M_re, -M_im)`` for the real output and
    ``(M_im, M_re)`` for the imaginary one.  Every level value is an exact
    integer sum under :func:`merge_ok`, so the plain f32 adds here equal
    the kernel's single-accumulator dot bit-for-bit, in any order."""
    rows = xrh.shape[0]

    def slices(hi, lo):
        out = []
        r_hi, r_lo = hi, lo
        for i in range(sx):
            m_i = (1.5 * 2.0 ** (23 - w * (i + 1))) * sig
            c = _opaque(_opaque(r_hi + m_i) - m_i)
            out.append(c)
            r_hi = _opaque(r_hi - c)
            r_hi, r_lo = two_sum(r_hi, r_lo)
        return jnp.stack(out)  # (sx, rows, K) f32 (bf16-exact values)

    cr = slices(xrh, xrl)
    ci = slices(xih, xil)
    m_re32 = m_re.astype(jnp.float32)  # (sm, K, ell)
    m_im32 = m_im.astype(jnp.float32)

    reh = rel = jnp.zeros((rows, ell), jnp.float32)
    imh = iml = jnp.zeros((rows, ell), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    groups = [(m_re32, -m_im32, "re")]
    if not real_out:
        groups.append((m_im32, m_re32, "im"))
    n_fold = min(cmax + 1, sx + sm - 1)
    ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))
    for mat_a, mat_b, which in groups:
        tail = None
        for d in range(n_fold):
            acc = None
            for i in range(min(d, sx - 1), -1, -1):
                j = d - i
                if j >= sm:
                    continue
                t = _opaque(
                    jnp.dot(cr[i], mat_a[j], precision=hp,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(ci[i], mat_b[j], precision=hp,
                              preferred_element_type=jnp.float32)
                )
                acc = t if acc is None else _opaque(acc + t)
            if acc is None:
                continue
            if d >= ft:
                tail = acc if tail is None else _opaque(tail + acc)
                continue
            if which == "re":
                s, e = two_sum(reh, acc)
                reh, rel = quick_two_sum(s, e + rel)
            else:
                s, e = two_sum(imh, acc)
                imh, iml = quick_two_sum(s, e + iml)
        if tail is not None:
            if which == "re":
                s, e = two_sum(reh, tail)
                reh, rel = quick_two_sum(s, e + rel)
            else:
                s, e = two_sum(imh, tail)
                imh, iml = quick_two_sum(s, e + iml)
    return reh, rel, imh, iml


def contract_last_oz_kernel(
    x: CDS,
    m: CSlicedMatrix,
    cmax: int = DEFAULT_CMAX,
    w: int = DEFAULT_W,
    interpret: Optional[bool] = None,
    real_in: bool = False,
    real_out: bool = False,
    phase: Optional[CDS] = None,
    conj: bool = False,
    repeat: Optional[int] = None,
    fold_tail: Optional[int] = None,
) -> CDS:
    """Fused-kernel version of :func:`contract_last_oz` (same math).

    ``fold_tail``: levels >= this are pre-summed in plain f32 before one
    compensated fold (bounded ~2^{-24-w*fold_tail} of the output scale —
    below ds noise for w*fold_tail >= 32); None keeps the all-ds fold.

    ``phase``: optional per-node diagonal phase vectors, CDS of shape
    ``(C, K)`` — the contraction computes ``sum_k (phase[node, k] * x[...,
    k]) * m[k, l]`` with the ds phase multiply fused into the kernel as a
    prologue (zero materialized intermediates); ``conj`` conjugates the
    phase (the g2 stream).  ``repeat``: the input ``x`` is shared by ``C``
    nodes (read in place via the block index map, never broadcast to HBM);
    the output gains a leading node axis.  Phase mode computes the slicing
    scales in-kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if phase is not None:
        return _phased_contract(
            x, m, phase, conj, repeat, cmax=cmax, w=w, interpret=interpret,
            fold_tail=fold_tail,
        )
    assert repeat is None, "repeat requires phase mode"
    shape = x.re.hi.shape
    k = shape[-1]
    sm, _, ell = m.re.shape
    rows = int(np.prod(shape[:-1]))
    rb = _row_block(rows)
    flat = lambda a: a.reshape(rows, k).astype(jnp.float32)
    xrh, xrl = flat(x.re.hi), flat(x.re.lo)
    if real_in:
        xih = xil = None
    else:
        xih, xil = flat(x.im.hi), flat(x.im.lo)

    if interpret:
        # non-TPU: the pure-jnp twin (see its docstring for why NOT
        # pallas interpret mode); sigma external here, in-kernel on TPU —
        # both are strictly-greater power-of-two row scales (valid
        # extractions; any difference is at the ds noise floor)
        sig_r = _pow2_ceil(jnp.max(jnp.abs(xrh), axis=-1, keepdims=True))
        sig_i = (
            None
            if real_in
            else _pow2_ceil(jnp.max(jnp.abs(xih), axis=-1, keepdims=True))
        )
        zz = jnp.zeros_like if real_in else (lambda a: a)
        out = _oz_contract_v2_jnp(
            sig_r,
            sig_r if real_in else sig_i,
            xrh, xrl,
            zz(xrh) if real_in else xih,
            zz(xrl) if real_in else xil,
            m.re, m.im,
            w=w, sx=DEFAULT_SLICES_X, sm=sm, ell=ell, cmax=cmax,
            real_in=real_in, real_out=real_out, fold_tail=fold_tail,
        )
        reh, rel, imh, iml = (a.reshape(shape[:-1] + (ell,)) for a in out)
        return CDS(DS(reh, rel), DS(imh, iml))

    row_spec = lambda width: pl.BlockSpec((rb, width), lambda i: (i, 0))
    if real_in:
        in_specs = [row_spec(k), row_spec(k)]
        operands = [xrh, xrl]
    else:
        in_specs = [row_spec(k)] * 4
        operands = [xrh, xrl, xih, xil]
    sx_eff, lgroups, gmats = _toeplitz_mats(m, DEFAULT_SLICES_X, cmax)
    mats = [p[0] for p in gmats] + [p[1] for p in gmats]
    kern = partial(
        _oz_contract_kernel_v3,
        w=w, sx=sx_eff, groups=lgroups, ell=ell, nlev=cmax + 1, sm=sm,
        pin=interpret, real_in=real_in, real_out=real_out,
        fold_tail=fold_tail,
    )
    mat_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0)) for a in mats
    ]
    n_out = 2 if real_out else 4
    out = pl.pallas_call(
        kern,
        grid=(rows // rb,),
        in_specs=in_specs + mat_specs,
        out_specs=[row_spec(ell)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, ell), jnp.float32)] * n_out,
        interpret=interpret,
    )(*operands, *mats)
    planes = [a.reshape(shape[:-1] + (ell,)) for a in out]
    if real_out:
        # callers consume .re only; the zero im planes are dead code
        z = jnp.zeros_like(planes[0])
        planes += [z, z]
    reh, rel, imh, iml = planes
    return CDS(DS(reh, rel), DS(imh, iml))


def _phased_contract(
    x, m, phase, conj, repeat, *, cmax, w, interpret, fold_tail=None
):
    """Diagonal-phase-fused contraction (see contract_last_oz_kernel)."""
    shape = x.re.hi.shape
    k = shape[-1]
    sm, _, ell = m.re.shape
    c = phase.re.hi.shape[0]  # nodes
    rows_in = int(np.prod(shape[:-1]))
    rows_per_node = rows_in if repeat else rows_in // c
    rows_out = c * rows_per_node
    rb = _row_block_in_node(rows_per_node)
    out_lead = (c,) + shape[:-1] if repeat else shape[:-1]

    flat = lambda a: a.reshape(-1, k).astype(jnp.float32)
    xrh, xrl = flat(x.re.hi), flat(x.re.lo)
    xih, xil = flat(x.im.hi), flat(x.im.lo)

    if interpret:
        # jnp twin: same EFT algebra (pinned), explicit t then the plain twin
        rep = (lambda a: jnp.tile(a, (c, 1))) if repeat else (lambda a: a)
        pex = lambda a: jnp.repeat(
            a.astype(jnp.float32), rows_per_node, axis=0
        )  # (rows_out, K)
        ph = (
            (pex(phase.re.hi), pex(phase.re.lo)),
            (pex(phase.im.hi), pex(phase.im.lo)),
        )
        tre, tim = _k_phase_cmul(
            (rep(xrh), rep(xrl)), (rep(xih), rep(xil)), ph, conj, _opaque
        )
        out = _oz_contract_v2_jnp(
            _phase_sigma(tre[0]), _phase_sigma(tim[0]),
            tre[0], tre[1], tim[0], tim[1], m.re, m.im,
            w=w, sx=DEFAULT_SLICES_X, sm=sm, ell=ell, cmax=cmax,
            fold_tail=fold_tail,
        )
        reh, rel, imh, iml = (a.reshape(out_lead + (ell,)) for a in out)
        return CDS(DS(reh, rel), DS(imh, iml))

    bpn_in = rows_in // rb if repeat else None  # blocks per node, shared x
    bpn_out = rows_per_node // rb
    if repeat:
        x_spec = pl.BlockSpec((rb, k), lambda i, _b=bpn_in: (i % _b, 0))
    else:
        x_spec = pl.BlockSpec((rb, k), lambda i: (i, 0))
    p_spec = pl.BlockSpec((8, k), lambda i, _b=bpn_out: (i // _b, 0))
    out_spec = pl.BlockSpec((rb, ell), lambda i: (i, 0))
    sx_eff, lgroups, gmats = _toeplitz_mats(m, DEFAULT_SLICES_X, cmax)
    mats = [p[0] for p in gmats] + [p[1] for p in gmats]
    kern = partial(
        _oz_contract_kernel_v3,
        w=w, sx=sx_eff, groups=lgroups, ell=ell, nlev=cmax + 1, sm=sm,
        pin=False, phase=True, conj=conj,
        fold_tail=fold_tail,
    )
    mat_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0)) for a in mats]
    # 8 replicated sublane rows per node (Mosaic minimum sublane block)
    p32 = lambda a: jnp.repeat(a.astype(jnp.float32), 8, axis=0)
    out = pl.pallas_call(
        kern,
        grid=(rows_out // rb,),
        in_specs=[x_spec] * 4 + [p_spec] * 4 + mat_specs,
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows_out, ell), jnp.float32)] * 4,
        interpret=False,
    )(
        xrh, xrl, xih, xil,
        p32(phase.re.hi), p32(phase.re.lo),
        p32(phase.im.hi), p32(phase.im.lo),
        *mats,
    )
    reh, rel, imh, iml = (a.reshape(out_lead + (ell,)) for a in out)
    return CDS(DS(reh, rel), DS(imh, iml))


def contract_last_oz_nodemat(
    x: CDS,
    m: CSlicedMatrix,
    cmax: int = DEFAULT_CMAX,
    w: int = DEFAULT_W,
    interpret: Optional[bool] = None,
    repeat: bool = False,
    fold_tail: Optional[int] = None,
    x_pre=None,
    real_out: bool = False,
    merged: Optional[bool] = None,
) -> CDS:
    """Per-node-matrix contraction: ``out[c, ..., l] = sum_k x[(c,) ..., k]
    * m[c, k, l]``.

    ``m`` carries a leading node axis (``slice_matrix_nodes`` layout,
    ``(C, sm, K, L)``).  With ``repeat=True`` the input ``x`` is one shared
    ``(..., K)`` operand contracted against every node's matrix (read in
    place via the block index map); otherwise ``x`` has the matching leading
    ``(C, ...)`` axis.  This is how the ds pipeline applies the per-node
    alpha phases: ``diag(alpha_axis) @ Vinv`` is folded into the matrix on
    the host (static tables), so the kernel runs NO phase arithmetic at all
    — versus the in-kernel ds phase prologue (``phase=`` mode), which costs
    ~220 VPU flops per element on what is a VPU-bound kernel.

    ``merged`` (None = off): run the K-MERGED complex contraction — both
    components sliced with a shared per-row scale and contracted against
    :func:`_toeplitz_mats_merged` K-concatenated stacks, so each Ozaki
    level needs ONE dot + ONE compensated fold per output component
    instead of two (the fold is the kernel's VPU bound).  Exactness of the
    single-accumulator level dots is gated by :func:`merge_ok`; raises if
    it fails.  The level VALUES equal the unmerged ones as real numbers
    only when the shared scale equals the per-component scale — otherwise
    chunks split differently and results agree to the ds noise floor
    (~2^-49 relative), not bitwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, sm = m.re.shape[0], m.re.shape[-3]
    ell = m.re.shape[-1]
    shape = x.re.hi.shape
    k = shape[-1]
    if merged is None:
        merged = False
    if merged and not merge_ok(k, sm=sm, cmax=cmax, w=w):
        raise ValueError(
            f"merged contraction is not exact at K={k} (merge_ok: "
            f"2K*pairs*2^(2w) must stay <= 2^24)"
        )
    if repeat:
        rows_pn = int(np.prod(shape[:-1]))
        out_lead = (c,) + shape[:-1]
    else:
        assert shape[0] == c, f"leading axis {shape[0]} != node count {c}"
        rows_pn = int(np.prod(shape[1:-1]))
        out_lead = shape[:-1]
    rows_out = c * rows_pn

    flat = lambda a: a.reshape(-1, k).astype(jnp.float32)
    xrh, xrl = flat(x.re.hi), flat(x.re.lo)
    xih, xil = flat(x.im.hi), flat(x.im.lo)

    if interpret:
        # slicing scales via _phase_sigma, matching the kernel (which
        # computes them in-kernel) bit-for-bit
        sig_r = _phase_sigma(xrh)
        sig_i = _phase_sigma(xih)
        outs = []
        for ci in range(c):
            if repeat:
                args = (sig_r, sig_i, xrh, xrl, xih, xil)
            else:
                sel = slice(ci * rows_pn, (ci + 1) * rows_pn)
                args = tuple(
                    a[sel] for a in (sig_r, sig_i, xrh, xrl, xih, xil)
                )
            if merged:
                outs.append(
                    _oz_contract_merged_jnp(
                        jnp.maximum(args[0], args[1]), *args[2:],
                        m.re[ci], m.im[ci],
                        w=w, sx=DEFAULT_SLICES_X, sm=sm, ell=ell, cmax=cmax,
                        real_out=real_out, fold_tail=fold_tail,
                    )
                )
                continue
            outs.append(
                _oz_contract_v2_jnp(
                    *args, m.re[ci], m.im[ci],
                    w=w, sx=DEFAULT_SLICES_X, sm=sm, ell=ell, cmax=cmax,
                    real_out=real_out, fold_tail=fold_tail,
                )
            )
        reh, rel, imh, iml = (
            jnp.concatenate([o[i] for o in outs], axis=0).reshape(
                out_lead + (ell,)
            )
            for i in range(4)
        )
        return CDS(DS(reh, rel), DS(imh, iml))

    rb = _row_block(rows_pn)
    bpn = rows_pn // rb
    if repeat:
        x_idx = lambda i, _b=bpn: (i % _b, 0)
    else:
        x_idx = lambda i: (i, 0)
    tmats = _toeplitz_mats_merged if merged else _toeplitz_mats
    sx_eff, lgroups, gmats = tmats(m, DEFAULT_SLICES_X, cmax)
    if merged and real_out:
        # the kernel's merged real_out mode never touches the im-output
        # stacks — don't fetch them into VMEM per grid step
        mats = [p[0] for p in gmats]
    else:
        mats = [p[0] for p in gmats] + [p[1] for p in gmats]
    mat_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda i, _b=bpn: (i // _b, 0, 0))
        for a in mats
    ]
    out_spec = pl.BlockSpec((rb, ell), lambda i: (i, 0))
    kern = partial(
        _oz_contract_kernel_v3,
        w=w, sx=sx_eff, groups=lgroups, ell=ell, nlev=cmax + 1, sm=sm,
        pin=False, node_mats=True,
        real_out=real_out, fold_tail=fold_tail, presliced=x_pre is not None,
        merged=merged,
    )
    if x_pre is not None:
        # shared operand arrives as pre-extracted bf16 chunks (preslice_rows)
        # — the kernel skips slicing entirely; bit-identical by construction
        assert repeat, "x_pre is only meaningful for the shared-x repeat mode"
        if merged:
            assert isinstance(x_pre, PreslicedM), (
                "merged kernel mode needs the merged preslice layout "
                "(preslice_rows(..., merged=True))"
            )
            x_args = (x_pre.full,)
            widths = (sx_eff * 2,)
        else:
            x_args = (x_pre.all_re, x_pre.all_im)
            widths = (sx_eff, sx_eff)
        x_specs = [pl.BlockSpec((rb, n * k), x_idx) for n in widths]
    else:
        x_args = (xrh, xrl, xih, xil)
        x_specs = [pl.BlockSpec((rb, k), x_idx)] * 4
    n_out = 2 if real_out else 4
    out = pl.pallas_call(
        kern,
        grid=(rows_out // rb,),
        in_specs=x_specs + mat_specs,
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows_out, ell), jnp.float32)] * n_out,
        interpret=False,
    )(*x_args, *mats)
    planes = [a.reshape(out_lead + (ell,)) for a in out]
    if real_out:
        # callers consume .re only; the zero im planes are dead code
        z = jnp.zeros_like(planes[0])
        planes += [z, z]
    reh, rel, imh, iml = planes
    return CDS(DS(reh, rel), DS(imh, iml))


# --------------------------------------------------------------------------
# fused g-main megakernel (round 4): the half-spectrum main block's THREE
# per-node contractions (y, x, half-z) in ONE kernel per node — the
# intermediates never leave VMEM.  Staged, each stage boundary costs a ds
# write + an XLA transpose pass + a ds read (~8 MB of HBM per node-stream at
# 64^3; measured ~78 ms of the 131 ms 64^3 eval is cmax-INDEPENDENT, i.e.
# boundary/glue cost — benchmarks/probe_knobs.py fit, docs/PERFORMANCE.md).
# In-kernel the boundaries are a 3-D register transpose (Mosaic lowers
# (2,1,0)/(2,0,1) permutes of (64,32,64)-class f32 arrays — compile-probed)
# + the same chunk re-extraction the staged stage-2/3 kernels run.  Values
# and fold order are IDENTICAL to the staged path, so results are
# bit-identical to the staged merged kernels.
# --------------------------------------------------------------------------


def _merged_prefix_planes(rh, rl, ih, il, w, sx, opq):
    """Merged-layout chunk prefix function from four f32 planes (the
    in-kernel twin of :func:`_slice_rows_merged`, shared scale).  The full
    concatenation is built ONCE; group prefixes are offset-0 lane slices of
    it (no per-group re-concatenation, chunk buffers die early)."""
    sig = jnp.maximum(_phase_sigma(rh), _phase_sigma(ih))
    cr = _chunk_rows(rh, rl, sig, w, sx, opq)
    ci = _chunk_rows(ih, il, sig, w, sx, opq)
    full = jnp.concatenate(
        [jnp.concatenate((cr[i], ci[i]), axis=1) for i in range(sx)], axis=1
    )
    blk = full.shape[1] // sx
    return lambda n: full[:, : n * blk]


def _merged_staircase(prefix, mre, mim, groups, ell, n_fold, ft, rb, opq, mat):
    """The merged staircase dots + compensated fold (exact level sums; the
    same loop the contraction kernel runs — see _oz_contract_kernel_v3's
    merged branch).  ``mim=None`` computes the real output only."""
    reh = rel = imh = iml = jnp.zeros((rb, ell), jnp.float32)
    out_groups = [(mre, "re")]
    if mim is not None:
        out_groups.append((mim, "im"))
    for mats_g, which in out_groups:
        tail = None
        for gi, (d0, d1, n) in enumerate(groups):
            if d0 >= n_fold:
                break
            p = jnp.dot(
                prefix(n), mat(mats_g[gi]),
                preferred_element_type=jnp.float32,
            )
            for d in range(d0, min(d1, n_fold)):
                acc = p[:, (d - d0) * ell:(d - d0 + 1) * ell]
                if d >= ft:
                    tail = acc if tail is None else opq(tail + acc)
                    continue
                if which == "re":
                    reh, rel = _k_add_float(reh, rel, acc, opq)
                else:
                    imh, iml = _k_add_float(imh, iml, acc, opq)
        if tail is not None:
            if which == "re":
                reh, rel = _k_add_float(reh, rel, tail, opq)
            else:
                imh, iml = _k_add_float(imh, iml, tail, opq)
    return reh, rel, imh, iml


def _gmain3_kernel(
    call_ref, *rest, w, sx, groups, dims, nlev, sm, fold_tail, pin=False,
):
    """One node's whole half-spectrum main block: y, x, half-z contractions
    with in-register transposes and re-slicing between them (merged mode).

    ``dims = (nx, nzh, ny, nz)``; the shared spectrum arrives presliced in
    the merged layout as ``(nx*nzh, sx*2*ny)`` (constant block — fetched
    once, resident across nodes); per-node Toeplitz stacks arrive with a
    leading 1 axis.  Output: the real main block's ds planes
    ``(nx*ny, nz)``."""
    nx, nzh, ny, nz = dims
    # Mosaic emits EFTs as written; interpret mode (XLA:CPU) needs pinning
    opq = _opaque if pin else (lambda v: v)
    ngr = len(groups)
    my = rest[: 2 * ngr]
    mx = rest[2 * ngr : 4 * ngr]
    mz = rest[4 * ngr : 5 * ngr]
    orh_ref, orl_ref = rest[5 * ngr : 5 * ngr + 2]
    mat = lambda r: r[0]
    n_fold = min(nlev, sx + sm - 1)
    ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))

    # stage 1 (y): shared presliced chunks, rows (nx, nzh), K = ny
    c_full = call_ref[:]
    blk = c_full.shape[1] // sx
    pre1 = lambda n: c_full[:, : n * blk]
    t = _merged_staircase(
        pre1, my[:ngr], my[ngr:], groups, ny, n_fold, ft, nx * nzh, opq, mat
    )
    # (nx, nzh, ny) -> (ny, nzh, nx): rows (ny, nzh), K = nx
    t = [jnp.transpose(a.reshape(nx, nzh, ny), (2, 1, 0)).reshape(
        ny * nzh, nx) for a in t]

    # stage 2 (x)
    pre2 = _merged_prefix_planes(t[0], t[1], t[2], t[3], w, sx, opq)
    t = _merged_staircase(
        pre2, mx[:ngr], mx[ngr:], groups, nx, n_fold, ft, ny * nzh, opq, mat
    )
    # (ny, nzh, nx) -> (nx, ny, nzh): rows (nx, ny), K = nzh
    t = [jnp.transpose(a.reshape(ny, nzh, nx), (2, 0, 1)).reshape(
        nx * ny, nzh) for a in t]

    # stage 3 (half-z, real output)
    pre3 = _merged_prefix_planes(t[0], t[1], t[2], t[3], w, sx, opq)
    reh, rel, _imh, _iml = _merged_staircase(
        pre3, mz, None, groups, nz, n_fold, ft, nx * ny, opq, mat
    )
    orh_ref[:] = reh
    orl_ref[:] = rel


def gmain3_nodemat(
    x_pre: "PreslicedM",
    m_y: CSlicedMatrix,
    m_x: CSlicedMatrix,
    m_zh: CSlicedMatrix,
    grid_shape,
    cmax: int = DEFAULT_CMAX,
    w: int = DEFAULT_W,
    fold_tail: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> DS:
    """Fused per-node main-block evaluation (merged layout; TPU target,
    interpret-mode twin off-TPU for the correctness suite).

    ``x_pre`` is the merged preslice of the masked half-z spectrum in the
    ``(Nx, Nz/2, Ny)`` layout (``preslice_rows(..., merged=True)``); the
    matrices are ``slice_matrix_nodes`` tables ``(C, sm, K_axis, L_axis)``.
    Returns the real main block as a ``(C, Nx, Ny, Nz)`` DS — bit-identical
    to the staged ``contract_last_oz_nodemat`` chain (same chunk values,
    same dots, same fold order; the stage boundaries become in-register
    transposes of the same f32 planes)."""
    nx, ny, nz = grid_shape
    nzh = nz // 2
    c = m_y.re.shape[0]
    for mm, k in ((m_y, ny), (m_x, nx), (m_zh, nzh)):
        if not merge_ok(k, sm=mm.re.shape[-3], cmax=cmax, w=w):
            raise ValueError("gmain3 needs merge_ok on every stage")
    sx_eff = min(DEFAULT_SLICES_X, cmax + 1)
    lgroups = _level_groups(cmax + 1, sx_eff)
    ngr = len(lgroups)

    def stacks(m, real_out=False):
        _sx, _g, gm = _toeplitz_mats_merged(m, DEFAULT_SLICES_X, cmax)
        if real_out:
            return [p[0] for p in gm]
        return [p[0] for p in gm] + [p[1] for p in gm]

    mats = stacks(m_y) + stacks(m_x) + stacks(m_zh, real_out=True)
    mat_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0)) for a in mats
    ]
    x_spec = pl.BlockSpec(x_pre.full.shape, lambda i: (0, 0))
    out_spec = pl.BlockSpec((nx * ny, nz), lambda i: (i, 0))
    sm = m_y.re.shape[-3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = partial(
        _gmain3_kernel,
        w=w, sx=sx_eff, groups=lgroups, dims=(nx, nzh, ny, nz),
        nlev=cmax + 1, sm=sm, fold_tail=fold_tail, pin=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[x_spec] + mat_specs,
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((c * nx * ny, nz), jnp.float32)
        ] * 2,
        interpret=interpret,
    )(x_pre.full, *mats)
    return DS(*(a.reshape(c, nx, ny, nz) for a in out))


def _gmain12_kernel(
    x_ref, *rest, w, sx, groups, dims, nlev, sm, fold_tail, pin=False,
):
    """One (node, z-half block) of the y+x contractions fused (merged mode):
    the stage-1 intermediate never leaves VMEM.  z is a passenger axis of
    BOTH stages, so blocking it shrinks the live set without changing any
    value (rows are independent).  Output layout ``(zb, nx, ny)`` — z-major
    so block writes are full-lane tiles."""
    nx, zb, ny = dims
    opq = _opaque if pin else (lambda v: v)
    ngr = len(groups)
    my = rest[: 2 * ngr]
    mx = rest[2 * ngr : 4 * ngr]
    outs = rest[4 * ngr : 4 * ngr + 4]
    mat = lambda r: r[0]
    n_fold = min(nlev, sx + sm - 1)
    ft = n_fold if fold_tail is None else max(1, min(fold_tail, n_fold))

    # stage 1 (y): shared presliced chunks for this z block, rows (nx, zb)
    full = x_ref[:].reshape(nx * zb, -1)
    blk = full.shape[1] // sx
    pre1 = lambda n: full[:, : n * blk]
    t = _merged_staircase(
        pre1, my[:ngr], my[ngr:], groups, ny, n_fold, ft, nx * zb, opq, mat
    )
    # (nx, zb, ny) -> (ny, zb, nx): rows (ny, zb), K = nx
    t = [jnp.transpose(a.reshape(nx, zb, ny), (2, 1, 0)).reshape(
        ny * zb, nx) for a in t]

    # stage 2 (x), complex output
    pre2 = _merged_prefix_planes(t[0], t[1], t[2], t[3], w, sx, opq)
    t = _merged_staircase(
        pre2, mx[:ngr], mx[ngr:], groups, nx, n_fold, ft, ny * zb, opq, mat
    )
    # (ny, zb, nx) -> (zb, nx, ny): full-lane output tiles
    for o_ref, a in zip(outs, t):
        o_ref[:] = jnp.transpose(a.reshape(ny, zb, nx), (1, 2, 0)).reshape(
            1, zb, nx, ny
        )


def default_zh_block(nx: int, nzh: int) -> int:
    """z-half block for the fused y+x kernel: the largest divisor of
    ``nzh`` keeping the per-step live set well under the 16 MB scoped VMEM
    (~<=1024 rows per stage at the default sx=7 merged width; 64^3 -> 16).

    Mosaic requires a block's sublane dim be a multiple of 8 or the whole
    axis (measured: zb=12 at 48^3 fails to lower), so candidates are
    restricted accordingly; nzh itself is always legal."""
    cap = max(1, 1024 // max(1, nx))
    best = nzh  # whole axis: always a legal block
    for zb in range(min(nzh, cap), 0, -1):
        if nzh % zb == 0 and (zb % 8 == 0 or zb == nzh):
            best = zb
            break
    return best


def gmain12_nodemat(
    x_pre: "PreslicedM",
    m_y: CSlicedMatrix,
    m_x: CSlicedMatrix,
    grid_shape,
    cmax: int = DEFAULT_CMAX,
    w: int = DEFAULT_W,
    fold_tail: Optional[int] = None,
    zh_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> CDS:
    """Fused y+x main-block contractions, z-half-blocked (merged layout).

    The full 3-stage fusion (:func:`gmain3_nodemat`) needs its entire live
    set in VMEM at once — measured 45.6 MB at 64^3 against the 16 MB scoped
    limit.  Here only stages 1-2 fuse, and the z-half axis (a passenger of
    both) is grid-blocked, so the per-step live set stays O(nx*zb) rows; the
    half-z contraction stays a staged :func:`contract_last_oz_nodemat` call.
    Per node-stream this removes the stage-1 boundary entirely (ds write +
    XLA transpose + ds read) and pre-transposes the stage-2 output in
    registers.  Returns the ``(C, Nx, Ny, Nz/2)`` CDS the half-z stage
    consumes — bit-identical to the staged chain (z blocks partition rows;
    every dot and fold is unchanged)."""
    nx, ny, nz = grid_shape
    nzh = nz // 2
    c = m_y.re.shape[0]
    for mm, k in ((m_y, ny), (m_x, nx)):
        if not merge_ok(k, sm=mm.re.shape[-3], cmax=cmax, w=w):
            raise ValueError("gmain12 needs merge_ok on both fused stages")
    zb = default_zh_block(nx, nzh) if zh_block is None else zh_block
    if nzh % zb:
        raise ValueError(f"zh_block {zb} must divide Nz/2 = {nzh}")
    sx_eff = min(DEFAULT_SLICES_X, cmax + 1)
    lgroups = _level_groups(cmax + 1, sx_eff)

    def stacks(m):
        _sx, _g, gm = _toeplitz_mats_merged(m, DEFAULT_SLICES_X, cmax)
        return [p[0] for p in gm] + [p[1] for p in gm]

    mats = stacks(m_y) + stacks(m_x)
    mat_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda i, j: (i, 0, 0))
        for a in mats
    ]
    wlanes = x_pre.full.shape[-1]
    x3 = x_pre.full.reshape(nx, nzh, wlanes)
    x_spec = pl.BlockSpec((nx, zb, wlanes), lambda i, j: (0, j, 0))
    out_spec = pl.BlockSpec((1, zb, nx, ny), lambda i, j: (i, j, 0, 0))
    sm = m_y.re.shape[-3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = partial(
        _gmain12_kernel,
        w=w, sx=sx_eff, groups=lgroups, dims=(nx, zb, ny),
        nlev=cmax + 1, sm=sm, fold_tail=fold_tail, pin=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(c, nzh // zb),
        in_specs=[x_spec] + mat_specs,
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((c, nzh, nx, ny), jnp.float32)
        ] * 4,
        interpret=interpret,
    )(x3, *mats)
    # (C, Nzh, Nx, Ny) -> (C, Nx, Ny, Nzh) for the staged half-z stage
    rh, rl, ih, il = (a.transpose(0, 2, 3, 1) for a in out)
    return CDS(DS(rh, rl), DS(ih, il))


def transform3_oz_nodemat(
    x: CDS,
    mats,
    cmax: int = DEFAULT_CMAX,
    kernel: Optional[bool] = None,
    repeat: bool = True,
    fold_tail: Optional[int] = None,
    w: int = DEFAULT_W,
    x_pre=None,
    merged: Optional[bool] = None,
) -> CDS:
    """``IFFT3(alpha_c . x)`` for a block of nodes with the separable
    per-axis phases FOLDED INTO per-node transform matrices.

    ``mats`` is an ``(mx, my, mz)`` triple of :func:`slice_matrix_nodes`
    tables of shape ``(C, sm, N_axis, N_axis)`` holding
    ``diag(alpha_axis[c]) @ Vinv_axis`` (built on the host — the phases are
    static quadrature tables, so this costs nothing at eval time).  With
    ``repeat=True`` (default) ``x`` is the shared ``(Nx, Ny, Nz)`` spectrum;
    returns ``(C, Nx, Ny, Nz)``.  Successor of
    :func:`transform3_oz_phased`: identical role, but the kernels run zero
    phase arithmetic (measured VPU-bound; see docs/PERFORMANCE.md).
    """
    mx, my, mz = mats
    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    interp = None if kernel else True
    ck = partial(
        contract_last_oz_nodemat, cmax=cmax, interpret=interp,
        fold_tail=fold_tail, w=w,
    )
    # merged applies per axis: each stage's K must pass the merge_ok
    # exactness bound independently (anisotropic grids differ per axis)
    mok = lambda mm: bool(merged) and merge_ok(
        mm.re.shape[-2], sm=mm.re.shape[-3], cmax=cmax, w=w
    )
    # x_pre (pre-extracted chunks of the shared x, see preslice_rows) feeds
    # only the first contraction — later axes consume per-node outputs.  The
    # jnp twin slices inline either way (bit-identical chunks).
    pre_kw = {"x_pre": x_pre} if (x_pre is not None and repeat) else {}
    x = ck(x, mz, repeat=repeat, merged=mok(mz), **pre_kw)  # z: (C,Nx,Ny,Nz)
    x = ds._swap_last2(ck(ds._swap_last2(x), my, merged=mok(my)))  # y
    x = ds._roll_axis(
        ck(ds._roll_axis(x, -3, -1), mx, merged=mok(mx)), -1, -3
    )  # x
    return x


def _hadamard_wsum_jnp(g1: CDS, g2: CDS, w: Optional[DS]) -> CDS:
    """Staged (pinned-EFT) twin of the fused Hadamard kernel: the exact op
    sequence collide_ds used before the kernel existed.  ``w=None`` sums the
    plain Hadamard products (the weight-folded half-spectrum path: the
    per-node quadrature weight is pre-folded into the g1 stream's tables)."""
    h = ds.cmul(g1, g2)
    s = None
    for j in range(h.re.hi.shape[0]):
        term = jax.tree.map(lambda a: a[j], h)
        if w is not None:
            term = ds.cmul_ds(term, jax.tree.map(lambda a: a[j], w))
        s = term if s is None else ds.cadd(s, term)
    return s


def _hadamard_wsum_kernel(
    g1rh, g1rl, g1ih, g1il, g2rh, g2rl, g2ih, g2il, wh_ref, wl_ref,
    orh, orl, oih, oil,
):
    """One VMEM pass of ``out += w_j * (g1_j . g2_j)`` (node j = grid dim 1).

    Same ds algebra as the staged twin (cmul -> cmul_ds -> cadd), evaluated
    in-register; the node axis accumulates via output-block revisiting (node
    is the innermost grid dimension, so each output block stays resident
    across all nodes).  The per-node weight rides in SMEM and multiplies as
    a scalar splat (vector (1,1)->(bm,L) broadcasts don't lower)."""
    j = pl.program_id(1)
    opq = lambda v: v  # Mosaic emits the EFTs as written; no pinning needed
    rr = _k_mul(g1rh[0], g1rl[0], g2rh[0], g2rl[0], opq)
    ii = _k_mul(g1ih[0], g1il[0], g2ih[0], g2il[0], opq)
    ri = _k_mul(g1rh[0], g1rl[0], g2ih[0], g2il[0], opq)
    ir = _k_mul(g1ih[0], g1il[0], g2rh[0], g2rl[0], opq)
    hre = _k_ds_sub(rr[0], rr[1], ii[0], ii[1], opq)
    him = _k_ds_add(ri[0], ri[1], ir[0], ir[1], opq)
    wh = wh_ref[j]
    wl = wl_ref[j]
    tre = _k_mul(hre[0], hre[1], wh, wl, opq)
    tim = _k_mul(him[0], him[1], wh, wl, opq)

    @pl.when(j == 0)
    def _():
        orh[:], orl[:] = tre
        oih[:], oil[:] = tim

    @pl.when(j > 0)
    def _():
        rh, rl = _k_ds_add(orh[:], orl[:], tre[0], tre[1], opq)
        ih, il = _k_ds_add(oih[:], oil[:], tim[0], tim[1], opq)
        orh[:], orl[:] = rh, rl
        oih[:], oil[:] = ih, il


def hadamard_wsum(
    g1: CDS, g2: CDS, w: DS, kernel: Optional[bool] = None
) -> CDS:
    """``sum_j w[j] * (g1[j] . g2[j])`` over the leading node axis.

    The collision pipeline's Hadamard product and weighted group sum
    (reference: ``FFTWBoltzmannOperator.cpp:233-273``) in one fused pass —
    staged, these are ~10 pinned elementwise ds ops each materializing an
    HBM-sized intermediate; fused, the traffic is one read of g1/g2 and one
    ds write of the sum.  ``w`` holds the per-node quadrature weights
    (leading axis matching g1/g2).  ``kernel=None`` auto-selects the Pallas
    kernel on TPU, the pinned staged twin elsewhere (same op sequence)."""
    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    c = g1.re.hi.shape[0]
    grid_shape = g1.re.hi.shape[1:]
    r = int(np.prod(grid_shape))
    lanes = next((l for l in (1024, 512, 256, 128) if r % l == 0), None)
    if not kernel or lanes is None or (r // lanes) % 8:
        return _hadamard_wsum_jnp(g1, g2, w)
    rows = r // lanes
    # 12 live (bm, lanes) f32 blocks + double buffering must fit the 16 MB
    # scoped-VMEM budget: bm=128/lanes=1024 is ~12 MB peak
    bm = next(b for b in (128, 64, 32, 16, 8) if rows % b == 0)
    flat = lambda a: a.reshape(c, rows, lanes).astype(jnp.float32)
    g_spec = pl.BlockSpec((1, bm, lanes), lambda i, j: (j, i, 0))
    # per-node ds weight as whole-array SMEM scalars, indexed by program_id
    from jax.experimental.pallas import tpu as pltpu

    w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    o_spec = pl.BlockSpec((bm, lanes), lambda i, j: (i, 0))
    out = pl.pallas_call(
        _hadamard_wsum_kernel,
        grid=(rows // bm, c),
        in_specs=[g_spec] * 8 + [w_spec] * 2,
        out_specs=[o_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, lanes), jnp.float32)] * 4,
    )(
        flat(g1.re.hi), flat(g1.re.lo), flat(g1.im.hi), flat(g1.im.lo),
        flat(g2.re.hi), flat(g2.re.lo), flat(g2.im.hi), flat(g2.im.lo),
        w.hi.astype(jnp.float32), w.lo.astype(jnp.float32),
    )
    reh, rel, imh, iml = (a.reshape(grid_shape) for a in out)
    return CDS(DS(reh, rel), DS(imh, iml))


def _hwh_layout(nx: int, ny: int, nz: int):
    """Kernel layout for :func:`hadamard_wsum_half`: ``(lanes, jyp, slabs,
    bm, m)`` with rows = nx*slabs, lanes = jyp*nz, bm = m*slabs — or None
    when the grid does not tile (fall back to the staged twin).

    Flat element (jx, jy, jz) sits at row ``jx*slabs + jy//jyp``, lane
    ``(jy%jyp)*nz + jz`` — so a plane field broadcasts as: px cycles its
    ``slabs`` row-slabs, py expands jz across lanes (0/1 selector dot),
    pz (pre-arranged per row) expands jy-offset across lanes."""
    for lanes in (1024, 512, 256, 128):
        if nz <= lanes and lanes % nz == 0:
            jyp = lanes // nz
            if ny % jyp == 0:
                slabs = ny // jyp
                rows = nx * slabs
                for bm in (32, 16, 8):
                    if bm % slabs == 0 and rows % bm == 0:
                        return lanes, jyp, slabs, bm, bm // slabs
    return None


def _hwh_kernel(*refs, m, slabs, weighted, ns_pg=None):
    """Fused half-spectrum Hadamard: reconstruct g1/g2 in-register from the
    real main blocks + plane corrections, then ``out += w_j*(g1_j.g2_j)``
    (``weighted=False``: ``out += g1_j.g2_j`` — the per-node weight is
    pre-folded into the g1 stream's tables at host f64, saving one ds
    multiply per element per node).

    ``ns_pg`` (group-batched mode): nodes per radial group — the node grid
    axis covers several radial groups back-to-back, each accumulating into
    its own output slab (the sum restarts whenever ``j % ns_pg == 0``; the
    output block index map routes group ``j // ns_pg`` to its slab, and the
    revisiting stays consecutive because node is the innermost grid dim).

    Expansions are exact: leading-dim slab cycling (broadcast+merge of
    untiled dims) and 0/1 selector dots at HIGHEST precision (one product
    per output, value*1.0 — exact on the MXU's f32 path)."""
    j = pl.program_id(1)
    jj = j if ns_pg is None else j % ns_pg
    (r1h, r1l, r2h, r2l) = refs[:4]
    planes = refs[4:28]  # 2 streams x 3 planes x (reh, rel, imh, iml)
    if weighted:
        sx_ref, sy_ref, sz_ref, s1_ref, s2_ref, wh_ref, wl_ref = refs[28:35]
        orh, orl = refs[35:]
    else:
        sx_ref, sy_ref, sz_ref, s1_ref, s2_ref = refs[28:33]
        orh, orl = refs[33:]
    opq = lambda v: v  # Mosaic emits the EFTs as written
    hp = jax.lax.Precision.HIGHEST

    # row r (in-tile) = (jx - jx0)*slabs + slab: slab-varying arrays cycle
    # on the leading axis, jx-varying arrays repeat each row `slabs` times
    cyc = lambda a: jnp.broadcast_to(
        a[None], (m,) + a.shape
    ).reshape((m * a.shape[0],) + a.shape[1:])
    rep = lambda a: jnp.broadcast_to(
        a[:, None], (a.shape[0], slabs) + a.shape[1:]
    ).reshape((a.shape[0] * slabs,) + a.shape[1:])
    sx = rep(sx_ref[...])  # (m, 1) -> (bm, 1), jx-varying
    sy = cyc(sy_ref[...])  # (slabs, lanes) -> (bm, lanes), slab-varying
    sz = sz_ref[...]  # (1, lanes)

    def expand(which, ref):
        a = ref[0]
        if which == 0:  # px: (slabs, lanes) row-slab cycle
            return cyc(a)
        if which == 1:  # py: (m, nz) -> selector on jz, repeat per jx
            return rep(jnp.dot(a, s1_ref[...], precision=hp,
                               preferred_element_type=jnp.float32))
        # pz rows: (bm, jyp) -> selector on jy-offset
        return jnp.dot(a, s2_ref[...], precision=hp,
                       preferred_element_type=jnp.float32)

    def rebuild(rh, rl, pl6):
        """g = r + sx.px + sy.py + sz.pz (same add order as the staged
        _assemble_g_half; all pattern multiplies exact ±1)."""
        pats = (sx, sy, sz)
        gre = (rh[0], rl[0])
        gim = None
        for p in range(3):
            reh_, rel_, imh_, iml_ = (
                expand(p, pl6[4 * p + q]) for q in range(4)
            )
            pat = pats[p]
            gre = _k_ds_add(gre[0], gre[1], pat * reh_, pat * rel_, opq)
            t = (pat * imh_, pat * iml_)
            gim = t if gim is None else _k_ds_add(gim[0], gim[1], *t, opq)
        return gre, gim

    g1re, g1im = rebuild(r1h, r1l, planes[:12])
    g2re, g2im = rebuild(r2h, r2l, planes[12:])

    # Re(h) only: Im(h) contributes EXACTLY nothing to Q (the final
    # Re(IFFT(.)) kills anti-Hermitian spectra and beta1 is real and
    # l -> -l symmetric — see hadamard_wsum_half's docstring), so the two
    # imaginary-product ds multiplies are dropped.  The epsilon streams
    # (g_im) still enter Re(h) through the ii term — the part whose
    # omission is the documented incorrect g-realness shortcut.
    rr = _k_mul(g1re[0], g1re[1], g2re[0], g2re[1], opq)
    ii = _k_mul(g1im[0], g1im[1], g2im[0], g2im[1], opq)
    tre = _k_ds_sub(rr[0], rr[1], ii[0], ii[1], opq)
    if weighted:
        wh = wh_ref[j]
        wl = wl_ref[j]
        tre = _k_mul(tre[0], tre[1], wh, wl, opq)

    @pl.when(jj == 0)
    def _():
        orh[:], orl[:] = tre

    @pl.when(jj > 0)
    def _():
        rh2, rl2 = _k_ds_add(orh[:], orl[:], tre[0], tre[1], opq)
        orh[:], orl[:] = rh2, rl2


def hadamard_wsum_half(
    r1: DS, c1, r2: DS, c2, w: Optional[DS], grid_shape, signs,
    assemble_fn, kernel: Optional[bool] = None, groups: int = 1,
) -> DS:
    """``sum_j w[j] * (g1[j] . g2[j])`` where each g is given FACTORED as a
    real main block plus three plane corrections (the half-spectrum form,
    :mod:`boltzfft.ds_operator`): the fused kernel reconstructs both
    streams in-register, so the dense complex g fields never touch HBM —
    staged, the assembly alone is ~10 broadcast ds-add passes per
    sub-batch (measured ~40 ms of a 165 ms 64^3 eval).

    ``w=None`` sums the plain products: the pipeline pre-folds the per-node
    quadrature weight into the g1 stream's z-half matrices and correction
    coefficients at host f64 (one exact table product replaces one runtime
    ds multiply per element per node).

    ``c1``/``c2`` are ``(px, py, pz)`` CDS plane tuples (line/point terms
    pre-folded); ``signs`` the per-axis ±1 parity vectors; ``assemble_fn``
    the staged assembler used by the off-TPU twin (same op order).

    Returns only ``Re(sum w h)`` as a DS — EXACT, not an approximation:
    the pipeline consumes this through ``Re(IFFT(beta1 * FFT(.)))`` per
    radial group, beta1 is real and ``l -> -l`` symmetric (it depends on
    ``|l|`` with Nyquist mapping to itself), and the anti-Hermitian part
    of ``FFT(s)`` — exactly ``FFT(i Im s)`` — yields a purely imaginary
    IFFT that the final real projection annihilates.  So ``Im(s)`` can
    never reach Q.  (This is NOT the rejected g-realness shortcut: the
    epsilon streams still enter ``Re(h) = R1 R2 - E1 E2`` exactly; only
    the provably-annihilated imaginary output is skipped.)

    ``groups > 1`` (radial-group batching): the node axis covers ``groups``
    radial groups back-to-back (``C = groups * ns_pg``, group-major order)
    and the result is the ``(groups,) + grid_shape`` stack of PER-GROUP
    sums — one kernel launch for all of them (the per-group accumulation
    restarts at each group's first node; within a group the add order is
    the same first-to-last sequence as ``groups=1``).  Only supported for
    ``w=None`` (the weight-folded pipeline — the only caller)."""
    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    nx, ny, nz = grid_shape
    lay = _hwh_layout(nx, ny, nz) if kernel else None
    if lay is None:
        if groups > 1:
            # staged twin: per-group assemble + Hadamard sum, same op order
            # as the kernel (group g's nodes are rows [g*ns_pg, (g+1)*ns_pg))
            assert w is None, "group batching requires the weight-folded form"
            c = r1.hi.shape[0]
            ns_pg = c // groups
            outs = []
            for g in range(groups):
                sel = slice(g * ns_pg, (g + 1) * ns_pg)
                tk = lambda t: jax.tree.map(lambda a: a[sel], t)
                g1 = assemble_fn(tk(r1), tk(c1), signs)
                g2 = assemble_fn(tk(r2), tk(c2), signs)
                outs.append(_hadamard_wsum_jnp(g1, g2, None).re)
            return jax.tree.map(lambda *a: jnp.stack(a), *outs)
        g1 = assemble_fn(r1, c1, signs)
        g2 = assemble_fn(r2, c2, signs)
        return _hadamard_wsum_jnp(g1, g2, w).re  # Re only, see above
    lanes, jyp, slabs, bm, m = lay
    c = r1.hi.shape[0]
    rows = nx * slabs
    sxv, syv, szv = signs

    fr = lambda a: a.reshape(c, rows, lanes).astype(jnp.float32)
    fx = lambda a: a.reshape(c, slabs, lanes).astype(jnp.float32)
    fy = lambda a: a.astype(jnp.float32)  # (c, nx, nz)
    fz = lambda a: a.reshape(c, rows, jyp).astype(jnp.float32)
    planes = []
    for cs in (c1, c2):
        px, py, pz = cs
        for field, f in ((px, fx), (py, fy), (pz, fz)):
            planes += [f(field.re.hi), f(field.re.lo),
                       f(field.im.hi), f(field.im.lo)]
    sy_pat = (
        syv.reshape(slabs, jyp)[:, :, None]
        * jnp.ones((1, 1, nz), jnp.float32)
    ).reshape(slabs, lanes)
    sz_lane = jnp.tile(szv, jyp).reshape(1, lanes)
    kz = np.arange(lanes) % nz
    ky = np.arange(lanes) // nz
    s1 = jnp.asarray((np.arange(nz)[:, None] == kz[None, :]), jnp.float32)
    s2 = jnp.asarray((np.arange(jyp)[:, None] == ky[None, :]), jnp.float32)

    from jax.experimental.pallas import tpu as pltpu

    r_spec = pl.BlockSpec((1, bm, lanes), lambda i, j: (j, i, 0))
    px_spec = pl.BlockSpec((1, slabs, lanes), lambda i, j: (j, 0, 0))
    py_spec = pl.BlockSpec((1, m, nz), lambda i, j: (j, i, 0))
    pz_spec = pl.BlockSpec((1, bm, jyp), lambda i, j: (j, i, 0))
    plane_specs = ([px_spec] * 4 + [py_spec] * 4 + [pz_spec] * 4) * 2
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim)
    sx_col = sxv.reshape(nx, 1)
    sx_spec = pl.BlockSpec((m, 1), lambda i, j: (i, 0))
    w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    weighted = w is not None
    ns_pg = None
    nb = rows // bm
    if groups > 1:
        # node grid axis spans `groups` radial groups; each group's sum
        # lands in its own row-slab of a (groups*rows, lanes) output (the
        # block revisits stay consecutive: node is the innermost grid dim)
        assert w is None, "group batching requires the weight-folded form"
        assert c % groups == 0
        ns_pg = c // groups
        o_spec = pl.BlockSpec(
            (bm, lanes), lambda i, j: ((j // ns_pg) * nb + i, 0)
        )
        out_rows = groups * rows
    else:
        o_spec = pl.BlockSpec((bm, lanes), lambda i, j: (i, 0))
        out_rows = rows
    spec_tail = [sx_spec, const(sy_pat), const(sz_lane), const(s1), const(s2)]
    args_tail = [sx_col, sy_pat, sz_lane, s1, s2]
    if weighted:
        spec_tail += [w_spec, w_spec]
        args_tail += [w.hi.astype(jnp.float32), w.lo.astype(jnp.float32)]
    out = pl.pallas_call(
        partial(_hwh_kernel, m=m, slabs=slabs, weighted=weighted,
                ns_pg=ns_pg),
        grid=(rows // bm, c),
        in_specs=[r_spec] * 4 + plane_specs + spec_tail,
        out_specs=[o_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32)] * 2,
    )(
        fr(r1.hi), fr(r1.lo), fr(r2.hi), fr(r2.lo), *planes, *args_tail,
    )
    oshape = ((groups,) if groups > 1 else ()) + tuple(grid_shape)
    reh, rel = (a.reshape(oshape) for a in out)
    return DS(reh, rel)


def transform3_oz_phased(
    f_hat: CDS,
    m,
    phases,
    conj: bool = False,
    cmax: int = DEFAULT_CMAX,
    kernel: Optional[bool] = None,
    w: int = DEFAULT_W,
    fold_tail: Optional[int] = None,
) -> CDS:
    """``IFFT3(alpha_b . f_hat)`` for a block of nodes with the separable
    per-axis phases fused into each axis contraction.

    ``f_hat`` is the shared ``(Nx, Ny, Nz)`` spectrum; ``phases`` is an
    ``(px, py, pz)`` triple of CDS tables of shape ``(C, N_axis)``;
    ``conj=True`` evaluates the conj-phase (g2) stream.  Returns
    ``(C, Nx, Ny, Nz)``.  This removes the materialized ``alpha``/
    ``alpha*f_hat`` intermediates entirely — measured 61% of the ds-oz
    eval before this path existed (round 3).
    """
    mx, my, mz = (m, m, m) if isinstance(m, CSlicedMatrix) else tuple(m)
    px, py, pz = phases
    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    interp = None if kernel else True
    ck = partial(
        contract_last_oz_kernel, cmax=cmax, interpret=interp, w=w,
        fold_tail=fold_tail,
    )
    c = px.re.hi.shape[0]
    # z axis: shared input, repeated per node
    x = ck(f_hat, mz, phase=pz, conj=conj, repeat=c)  # (C, Nx, Ny, Nz)
    # y axis
    x = ds._swap_last2(ck(ds._swap_last2(x), my, phase=py, conj=conj))
    # x axis
    x = ds._roll_axis(
        ck(ds._roll_axis(x, -3, -1), mx, phase=px, conj=conj), -1, -3
    )
    return x


def transform3_oz(
    x: CDS,
    m,
    cmax: int = DEFAULT_CMAX,
    kernel: Optional[bool] = None,
    real_in: bool = False,
    real_out: bool = False,
    fold_tail: Optional[int] = None,
    w: int = DEFAULT_W,
) -> CDS:
    """Separable 3-D transform of the trailing (Nx, Ny, Nz) axes with the
    sliced matrix/matrices ``m`` (one :class:`CSlicedMatrix` shared by all
    axes, or a per-axis (mx, my, mz) tuple) — the MXU analog of
    :func:`boltzfft.ds.transform3`.

    ``kernel=None`` auto-selects the fused Pallas contraction on TPU and the
    pure-jnp twin elsewhere (same arithmetic either way)."""
    # CSlicedMatrix is itself a NamedTuple — test the type, not tuple-ness
    mx, my, mz = (m, m, m) if isinstance(m, CSlicedMatrix) else tuple(m)
    if kernel is None:
        kernel = jax.default_backend() == "tpu"
    # kernel=True off-TPU runs the jnp twin (tests)
    c = (
        partial(contract_last_oz_kernel, fold_tail=fold_tail, w=w)
        if kernel
        else partial(contract_last_oz, fold_tail=fold_tail, w=w)
    )
    x = c(x, mz, cmax, real_in=real_in)  # z
    x = ds._swap_last2(c(ds._swap_last2(x), my, cmax))  # y
    x = ds._roll_axis(
        c(ds._roll_axis(x, -3, -1), mx, cmax, real_out=real_out), -1, -3
    )  # x
    return x
