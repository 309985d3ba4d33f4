"""Fused Pallas TPU kernels for the non-FFT hot stages.

The TPU-native analog of the reference's CUDA kernel layer
(``Collisions/BoltzmannCUDAKernels.cu``) and of its loop-scheduling study
(``loop_benchmark_cpu.cpp``).  Two kernels cover the two hot patterns:

* ``alpha_multiply``: per-node phase multiply producing *both* ``alpha1*f_hat``
  and ``conj(alpha1)*f_hat`` in one pass, with alpha built in-register from the
  separable per-axis factors — the fused equivalent of
  ``compute_alpha_times_f_hat`` (``BoltzmannCUDAKernels.cu:21-59``), which also
  computes alpha on the fly but re-reads f_hat per node from HBM.
* ``gain_reduce``: the weighted node reduction
  ``Q_hat(l) += w_b * beta1(rho_b, |l|) * h_hat(b, l)`` with ``beta1`` computed
  in-register — a deterministic single-writer accumulation replacing the
  reference's ``atomic_tensor_contraction`` (``BoltzmannCUDAKernels.cu:79-123``).

Complex arrays travel as separate (re, im) float planes: Pallas TPU has no
complex dtype support.  Kernels run compiled on TPU and in interpreter mode on
CPU (selected automatically), so the same code path is testable without
hardware.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_PRECISION_MAP = {
    # TPU f32 matmul passes: default = fastest (bf16-class products),
    # "highest" = multi-pass f32-faithful.  (Precision.HIGH / bf16_3x is not
    # lowerable inside Mosaic kernels — "Unsupported dot precision: HIGH".)
    "default": None,
    "highest": jax.lax.Precision.HIGHEST,
}


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# gain_reduce: out[l] = sum_b gw[b] * beta1(rho[b], |l|) * h[b, l]
# --------------------------------------------------------------------------


def _gain_reduce_kernel(
    rho_ref, gw_ref, nl_ref, hr_ref, hi_ref, or_ref, oi_ref, *, coef, amp, eps, nb
):
    j = pl.program_id(1)  # node-chunk position (innermost, sequential on TPU)

    @pl.when(j == 0)
    def _():
        or_ref[:] = jnp.zeros_like(or_ref)
        oi_ref[:] = jnp.zeros_like(oi_ref)

    nl = nl_ref[:]  # (TR, 128) mode-norm tile
    acc_r = jnp.zeros_like(nl)
    acc_i = jnp.zeros_like(nl)
    base = j * nb  # rho/gw live whole in SMEM; index by grid position
    for b in range(nb):  # static unrolled loop over the node chunk
        arg = (coef * rho_ref[base + b]) * nl + eps
        w = (amp * gw_ref[base + b]) * jnp.sin(arg) / arg
        acc_r = acc_r + w * hr_ref[b]
        acc_i = acc_i + w * hi_ref[b]
    or_ref[:] = or_ref[:] + acc_r
    oi_ref[:] = oi_ref[:] + acc_i


def gain_reduce(
    h_r: jnp.ndarray,  # (B, M) real part of h_hat, M flattened modes
    h_i: jnp.ndarray,
    rho: jnp.ndarray,  # (B,)
    gain_w: jnp.ndarray,  # (B,)
    norm_l: jnp.ndarray,  # (M,)
    *,
    length: float,
    b_gamma: float,
    node_block: int = 8,
    row_block: int = 8,
):
    """Fused weighted gain reduction over the node axis.

    Computes ``out = sum_b gain_w[b] * beta1(rho[b], norm_l) * h[b]`` with
    ``beta1 = 4 pi b_gamma sincc(pi rho |l| / (2L))`` evaluated in-register
    (one read of h, no materialized (B, M) weight array).
    """
    b, m = h_r.shape
    m_out = m  # unpadded output length
    dt = h_r.dtype
    lanes = 128
    if m % lanes:
        pad = lanes - m % lanes
        h_r = jnp.pad(h_r, ((0, 0), (0, pad)))
        h_i = jnp.pad(h_i, ((0, 0), (0, pad)))
        norm_l = jnp.pad(norm_l, (0, pad), constant_values=1.0)
        m += pad
    rows = m // lanes
    # Mosaic requires the 2nd-to-last block dim divisible by 8 or equal to the
    # full array dim.
    rb = row_block if rows % row_block == 0 and row_block % 8 == 0 else rows
    nb = math.gcd(node_block, b)

    hr3 = h_r.reshape(b, rows, lanes)
    hi3 = h_i.reshape(b, rows, lanes)
    nl2 = norm_l.reshape(rows, lanes)

    eps = float(np.finfo(dt).eps)
    kernel = partial(
        _gain_reduce_kernel,
        coef=math.pi / (2.0 * length),
        amp=4.0 * math.pi * b_gamma,
        eps=eps,
        nb=nb,
    )
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(rows // rb, b // nb),
        in_specs=[
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, rb, lanes), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, rb, lanes), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, lanes), dt),
            jax.ShapeDtypeStruct((rows, lanes), dt),
        ],
        interpret=_interpret(),
    )(rho.astype(dt), gain_w.astype(dt), nl2.astype(dt), hr3, hi3)
    return out_r.reshape(-1)[:m_out], out_i.reshape(-1)[:m_out]


# --------------------------------------------------------------------------
# fused_gain: the whole per-node pipeline (phase multiply -> inverse 3-D DFT
# -> Hadamard -> forward 3-D DFT -> weighted accumulate) in one VMEM-resident
# kernel.  HBM traffic collapses to one f_hat read (shared across the grid)
# plus one Q_hat accumulation — the staged XLA pipeline materializes ~6
# (B, N^3) intermediates instead.
# --------------------------------------------------------------------------


def _dft3(n, mr, mi, tr, ti, px=None, py=None, pz=None, precision=None):
    """In-VMEM complex 3-D transform of (..., N, N, N) re/im planes with the
    shared (N, N) axis matrix (mr, mi), with optional per-axis diagonal phase
    factors fused in (``px``/``py``/``pz`` are ``(re, im)`` arrays broadcast
    against the lane axis — ``(N,)`` shared or ``(C, N)`` per leading batch).

    Every axis is transformed as a tall ``(C N^2, N) @ (N, N)`` MXU matmul
    (Karatsuba: 3 real dots per complex contraction).  Axis positioning uses
    only Mosaic-supported vector ops: leading-dim reshapes (lane dimension
    untouched), a last-two-axis swap for y, and a rotation transpose for x —
    lane-crossing reshapes are rejected by the compiler.  Each phase is
    applied while its axis sits in the lane position, so phases never need a
    lane->sublane reshape (also unsupported).
    """
    shape = tr.shape
    batched = len(shape) == 4
    rot_fwd = (0, 2, 3, 1) if batched else (1, 2, 0)
    rot_bwd = (0, 3, 1, 2) if batched else (2, 0, 1)

    def cdot(ar, ai, br, bi):
        dot = partial(jnp.dot, preferred_element_type=ar.dtype, precision=precision)
        p1 = dot(ar, br)
        p2 = dot(ai, bi)
        p3 = dot(ar + ai, br + bi)
        return p1 - p2, p3 - p1 - p2

    mrt, mit = mr.T, mi.T

    def phase_shape(p):
        # (N,) -> (1, .., N); (C, N) -> (C, 1, 1, N)
        if p.ndim == 1:
            return p.reshape((1,) * (len(shape) - 1) + (n,))
        return p.reshape(p.shape[0], 1, 1, n)

    def last_axis(tr, ti, phase):
        if phase is not None:
            pr = phase_shape(phase[0])
            pi = phase_shape(phase[1])
            tr, ti = tr * pr - ti * pi, tr * pi + ti * pr
        tr2, ti2 = cdot(tr.reshape(-1, n), ti.reshape(-1, n), mrt, mit)
        return tr2.reshape(tr.shape), ti2.reshape(ti.shape)

    # z (last) axis; ti=None marks an exactly-real input (the group-sum
    # forward after the Im(h) annihilation) — two plain dots instead of a
    # Karatsuba complex contraction on the first axis
    if ti is None:
        assert pz is None, "real input with a z phase is unsupported"
        dot = partial(jnp.dot, preferred_element_type=tr.dtype,
                      precision=precision)
        flat = tr.reshape(-1, n)
        tr, ti = (
            dot(flat, mrt).reshape(tr.shape),
            dot(flat, mit).reshape(tr.shape),
        )
    else:
        tr, ti = last_axis(tr, ti, pz)
    # y axis: swap j<->k, transform, swap back
    tr, ti = last_axis(jnp.swapaxes(tr, -1, -2), jnp.swapaxes(ti, -1, -2), py)
    tr, ti = jnp.swapaxes(tr, -1, -2), jnp.swapaxes(ti, -1, -2)
    # x axis: rotate x to last, transform, rotate back
    tr, ti = last_axis(
        jnp.transpose(tr, rot_fwd), jnp.transpose(ti, rot_fwd), px
    )
    return jnp.transpose(tr, rot_bwd), jnp.transpose(ti, rot_bwd)


def _fused_gain_kron_kernel(
    rho_ref, gw_ref,
    axr_ref, axi_ref, ayzr_ref, ayzi_ref,
    fr_ref, fi_ref, vr_ref, vi_ref, fwr_ref, fwi_ref, kr_ref, ki_ref, nl_ref,
    or_ref, oi_ref,
    g1r_s, g1i_s, g2r_s, g2i_s,
    *, nx, nyz, c, gs, coef, amp, eps, precision,
):
    """Transpose-free scheme: tensors live as (C, Nx, Ny*Nz) with (j,k) fused
    on the lane axis.  The y/z transform is ONE right-multiply by the shared
    Kronecker matrix Vyz = Vy (x) Vz — contraction depth Ny*Nz keeps the MXU
    tiles completely full — and the x transform is a per-node left-multiply
    with the alpha_x phase folded into the (Nx, Nx) matrix.  No vector
    transposes or lane-crossing reshapes anywhere.  ``gs`` nodes share a
    radial quadrature point and get one forward transform (see the group-sum
    hoisting below).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        or_ref[:] = jnp.zeros_like(or_ref)
        oi_ref[:] = jnp.zeros_like(oi_ref)

    fr, fi = fr_ref[:], fi_ref[:]  # (Nx, Ny*Nz) f_hat planes
    vr, vi = vr_ref[:], vi_ref[:]
    kr, ki = kr_ref[:], ki_ref[:]  # (NyNz, NyNz) kron(Vy_inv, Vz_inv), symmetric

    def cmm(ar, ai, br, bi):  # Karatsuba complex matmul of 2-D values
        dot = partial(jnp.dot, preferred_element_type=ar.dtype, precision=precision)
        p1 = dot(ar, br)
        p2 = dot(ai, bi)
        p3 = dot(ar + ai, br + bi)
        return p1 - p2, p3 - p1 - p2

    def inverse(sign, out_r, out_i):
        # t = (ayz^sign) * f_hat, lane-phase per node
        pr = ayzr_ref[:].reshape(c, 1, nyz)
        pi = sign * ayzi_ref[:].reshape(c, 1, nyz)
        tr = fr * pr - fi * pi  # (C, Nx, Ny*Nz)
        ti = fr * pi + fi * pr
        # y/z axes: one shared full-depth Kron matmul (K symmetric)
        tr2, ti2 = cmm(tr.reshape(c * nx, nyz), ti.reshape(c * nx, nyz), kr, ki)
        tr2 = tr2.reshape(c, nx, nyz)
        ti2 = ti2.reshape(c, nx, nyz)
        # x axis: per-node left-multiply, alpha_x folded into the matrix
        for cc in range(c):
            mxr = vr * axr_ref[cc, :] - vi * (sign * axi_ref[cc, :])
            mxi = vr * (sign * axi_ref[cc, :]) + vi * axr_ref[cc, :]
            rr, ii = cmm(mxr, mxi, tr2[cc], ti2[cc])
            out_r[cc] = rr
            out_i[cc] = ii

    inverse(1.0, g1r_s, g1i_s)
    inverse(-1.0, g2r_s, g2i_s)

    # Im(h) is dropped EXACTLY: Q_gain = Re(IFFT(sum_r beta1(r) FFT(s_r)))
    # with beta1 real and l -> -l symmetric, so the anti-Hermitian part of
    # each FFT(s) — exactly FFT(i Im s) — yields a purely imaginary IFFT
    # that the final real projection annihilates (the same theorem as the
    # ds pipeline's hadamard_wsum_half; math in that docstring).  This
    # halves the Hadamard/group-sum VPU work and turns the x leg of the
    # group forward into two plain dots.
    hr = g1r_s[:] * g2r_s[:] - g1i_s[:] * g2i_s[:]

    # beta1 depends only on the radial node, so nodes sharing rho (the
    # spherical-design members of one radial group) are gw-weighted and
    # *summed before* the forward transform — one forward DFT per group
    # instead of per node (FFTWBoltzmannOperator.cpp:252-273 does this
    # weighting per node inside the atomics loop; linearity makes the
    # hoisting exact).
    base = i * c
    n_groups = c // gs
    fwr, fwi = fwr_ref[:], fwi_ref[:]
    n2 = float(nyz)
    nl = nl_ref[:]
    dot = partial(jnp.dot, preferred_element_type=hr.dtype,
                  precision=precision)
    acc_r = jnp.zeros_like(nl)
    acc_i = jnp.zeros_like(nl)
    for g in range(n_groups):
        sr = jnp.zeros((nx, nyz), hr.dtype)
        for cc in range(g * gs, (g + 1) * gs):
            w = gw_ref[base + cc]
            sr = sr + w * hr[cc]
        # forward transform of the REAL group sum: x axis with the shared F
        # matrix (real input: two plain dots), then y/z via the
        # conjugate-scaled Kron (F_y (x) F_z = Ny*Nz conj K)
        sr, si = dot(fwr, sr), dot(fwi, sr)
        sr, si = cmm(sr, si, n2 * kr, -n2 * ki)
        arg = (coef * rho_ref[base + g * gs]) * nl + eps
        beta1 = amp * jnp.sin(arg) / arg
        acc_r = acc_r + beta1 * sr
        acc_i = acc_i + beta1 * si
    or_ref[:] = or_ref[:] + acc_r
    oi_ref[:] = oi_ref[:] + acc_i


# --------------------------------------------------------------------------
# Cooley-Tukey block-factorized scheme ("ct"): the y/z pair transform of the
# kron scheme, but with each axis split as N = R * S (S <= 32).  In a
# block-major permuted lane basis the two-axis transform becomes R^2 matmuls
# against the small shared kron(U_S, U_S) table plus lane-local twiddles and
# trace-time-unrolled butterflies — N/(2R) x fewer MXU FLOPs than the dense
# (N^2, N^2) Kron matmul while keeping MXU-saturating contraction depth S^2.
# This removes the kron scheme's N <= 32 VMEM ceiling (the dense table is
# 128 MB at N=64) and is the TPU answer to the reference's per-node FFTW
# plan execution at 64^3 (FFTWBoltzmannOperator.cpp:191-276).
#
# Lane bases (permutations applied OUTSIDE the kernel as one cheap gather):
#   modes  M~: lane = (p_y, p_z, ly', lz'),  l = R*l' + p   (DIT parity split)
#   points P~: lane = (a_y, a_z, y'', z''),  y = S*a  + y''  (block split)
# Inverse (M~ -> P~): per parity block, matmul by kron(U_S,U_S)/R^2, multiply
# the twiddle exp(+2 pi i (p_y y'' + p_z z'')/N), then an R-point DFT across
# blocks per dimension (adds only for R in {2,4}).  Forward (P~ -> M~) is the
# exact adjoint order with conjugated twiddles and the scaled-conjugate table.
# --------------------------------------------------------------------------


def _ct_pick_radix(n: int, radix: int = 0) -> int:
    """Radix R for the ct scheme (0 = auto).  Hardware-valid splits need
    S = N/R in {16, 32} (parity blocks of S^2 lanes must be 128-multiples);
    smaller S is allowed only in interpret mode (tests), never auto-selected
    for a real TPU — those sizes fall back to the kron/transpose schemes.
    Returns 0 if no valid split exists."""
    if radix:
        if n % radix or n // radix < 2:
            raise ValueError(f"radix {radix} invalid for n={n}")
        return radix
    if n % 16 == 0 and 2 <= n // 16 <= 8:
        return n // 16  # S=16: FLOP-optimal, 256-lane blocks
    if n % 32 == 0 and n // 32 >= 2:
        return n // 32
    if _interpret():
        for r in (2, 3, 4, 5, 6, 8):  # small-n test fallback (interpret only)
            if n % r == 0 and n // r >= 4:
                return r
    return 0


def _ct_mode_perm(ny: int, ry: int, nz: int, rz: int) -> np.ndarray:
    """new-lane -> old-lane map for the block-major mode basis (per-axis
    radix: the y axis splits as Ny = Ry*Sy, z as Nz = Rz*Sz)."""
    sy, sz = ny // ry, nz // rz
    py, pz, ly, lz = np.meshgrid(
        np.arange(ry), np.arange(rz), np.arange(sy), np.arange(sz), indexing="ij"
    )
    return ((ry * ly + py) * nz + (rz * lz + pz)).reshape(-1)


def _ct_pos_perm(ny: int, ry: int, nz: int, rz: int) -> np.ndarray:
    """new-lane -> old-lane map for the block-major position basis."""
    sy, sz = ny // ry, nz // rz
    ay, az, yy, zz = np.meshgrid(
        np.arange(ry), np.arange(rz), np.arange(sy), np.arange(sz), indexing="ij"
    )
    return ((sy * ay + yy) * nz + (sz * az + zz)).reshape(-1)


def _inv_perm(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(p.shape[0])
    return inv


def _ct_tables(ny: int, ry: int, nz: int, rz: int):
    """(K_inv re/im, twiddle re/im) numpy f64 tables for the ct scheme."""
    sy, sz = ny // ry, nz // rz

    def u(s):
        lp = np.arange(s)
        return np.exp(2j * np.pi * np.outer(lp, lp) / s) / s  # inverse, 1/S

    k = np.kron(u(sy), u(sz)) / (ry * rz)  # fold the rest of 1/(Ny*Nz)
    yy, zz = np.meshgrid(np.arange(sy), np.arange(sz), indexing="ij")
    tw = np.stack(
        [
            np.exp(2j * np.pi * (py * yy / ny + pz * zz / nz)).reshape(-1)
            for py in range(ry)
            for pz in range(rz)
        ]
    )
    return k.real, k.imag, tw.real, tw.imag


def ct_vmem_bytes(nx: int, ny: int, nz: int) -> int:
    """Peak VMEM working-set estimate for the io ct megakernel: ~14
    (Nx, Ny*Nz) f32 planes (f_hat + gain accumulators + io scratches +
    transform temps).  Single source of truth for the ceiling check."""
    return 14 * nx * ny * nz * 4


CT_VMEM_BUDGET = 100 << 20  # past this Mosaic's scoped vmem OOMs (measured)


def _as_axes(m):
    """Normalize a transform-matrix argument to an (x, y, z) triple of
    (2, N, N) stacks: a single shared stack (cubic) or a per-axis tuple."""
    if isinstance(m, (tuple, list)):
        return tuple(m)
    return (m, m, m)


def pick_scheme(nx: int, ny: int, nz: int) -> str:
    """The shared ``scheme="auto"`` rule (used by ``operator.collide`` and
    :func:`fused_gain` so they can never disagree): kron when the
    (NyNz, NyNz) table is small, ct when both lane axes have valid radix
    splits, transpose for larger cubic grids, and kron again for
    anisotropic grids whose table still fits the VMEM budget.  Raises a
    clear error (naming the staged alternative) when nothing fits —
    CollisionConfig cannot know the backend at construction time, so this
    is the earliest the check can run."""
    # ct first: the io megakernel (fully in-kernel eval) exists only for ct
    # and is the measured-fastest path wherever valid radices exist
    if _ct_pick_radix(ny) and _ct_pick_radix(nz):
        return "ct"
    if ny * nz <= 1024:
        return "kron"
    if nx == ny == nz:
        return "transpose"
    if 2 * (ny * nz) ** 2 * 4 <= (28 << 20):  # table still fits VMEM
        return "kron"
    raise ValueError(
        f"no fused scheme fits grid ({nx},{ny},{nz}) on this backend "
        "(Ny*Nz too large for the kron table and no hardware-valid "
        "Cooley-Tukey radix for both lane axes); use impl='rfft' or 'c2c'"
    )


def _bf1d(vals, r, sign):
    """R-point DFT across a list of (re, im) blocks, unrolled at trace time.

    out[a] = sum_p omega^(a p) vals[p],  omega = exp(sign * 2 pi i / R).
    R in {2, 4} lowers to adds and re/im swaps only (omega powers are
    +-1, +-i); other R use trace-time complex constants.
    """
    if r == 1:
        return list(vals)
    if r == 2:
        (ar, ai), (br, bi) = vals
        return [(ar + br, ai + bi), (ar - br, ai - bi)]
    if r == 4:
        (t0r, t0i), (t1r, t1i), (t2r, t2i), (t3r, t3i) = vals
        e0r, e0i = t0r + t2r, t0i + t2i
        e1r, e1i = t0r - t2r, t0i - t2i
        o0r, o0i = t1r + t3r, t1i + t3i
        o1r, o1i = t1r - t3r, t1i - t3i
        # sign*i * o1  ->  (-sign*o1_im, sign*o1_re)
        w1r, w1i = -sign * o1i, sign * o1r
        return [
            (e0r + o0r, e0i + o0i),
            (e1r + w1r, e1i + w1i),
            (e0r - o0r, e0i - o0i),
            (e1r - w1r, e1i - w1i),
        ]
    out = []
    for a in range(r):
        accr = acci = None
        for p, (tr, ti) in enumerate(vals):
            wr = math.cos(2.0 * math.pi * a * p / r)
            wi = sign * math.sin(2.0 * math.pi * a * p / r)
            if abs(wr - 1.0) < 1e-15 and abs(wi) < 1e-15:
                cr, ci = tr, ti
            elif abs(wr + 1.0) < 1e-15 and abs(wi) < 1e-15:
                cr, ci = -tr, -ti
            elif abs(wr) < 1e-15 and abs(wi - 1.0) < 1e-15:
                cr, ci = -ti, tr
            elif abs(wr) < 1e-15 and abs(wi + 1.0) < 1e-15:
                cr, ci = ti, -tr
            else:
                cr, ci = wr * tr - wi * ti, wr * ti + wi * tr
            accr = cr if accr is None else accr + cr
            acci = ci if acci is None else acci + ci
        out.append((accr, acci))
    return out


def _block_dft_2d(blocks, ry, rz, sign):
    """Apply the per-dimension block DFTs (Ry-point outer, Rz-point inner).

    ``blocks`` is a flat list of Ry*Rz (re, im) pairs indexed outer*Rz +
    inner; the inner dimension is transformed first, then the outer.
    """
    mid = []
    for py in range(ry):
        mid.extend(_bf1d(blocks[py * rz:(py + 1) * rz], rz, sign))
    out = [None] * (ry * rz)
    for z in range(rz):
        col = _bf1d([mid[py * rz + z] for py in range(ry)], ry, sign)
        for a in range(ry):
            out[a * rz + z] = col[a]
    return out


def _fused_ct_kernel(*refs, nx, ny, nz, ry, rz, c, cc, gs, coef, amp, eps,
                     precision, io, x_stacked=False):
    """The ct-scheme megakernel (per-axis sizes/radices; cubic grids pass
    nx = ny = nz, ry = rz).

    Non-io mode consumes f_hat (mode-permuted re/im planes) and accumulates
    the gain spectrum into the two outputs across sequential grid steps.

    io mode fuses the whole collision eval into the one kernel: step 0
    forward-transforms the (position-permuted) real input f into the f_hat
    scratch and builds the loss convolution Re IFFT(beta2 f_hat); the final
    step inverse-transforms the gain accumulator and emits
    ``Q = Re(IFFT(Q_gain_hat)) - Re(IFFT(beta2 f_hat)) * f`` directly
    (reference assembly: FFTWBoltzmannOperator.cpp:281-330) — zero staged
    XLA transforms remain.
    """
    s2 = (ny // ry) * (nz // rz)
    r2 = ry * rz
    n2 = ny * nz
    if io:
        (rho_ref, gw_ref, axr_ref, axi_ref, ayzr_ref, ayzi_ref,
         fpr_ref, b2_ref, vr_ref, vi_ref, fwr_ref, fwi_ref,
         kr_ref, ki_ref, twr_ref, twi_ref, nl_ref,
         q_ref, fhr_s, fhi_s, b2f_s, accr, acci) = refs
    else:
        (rho_ref, gw_ref, axr_ref, axi_ref, ayzr_ref, ayzi_ref,
         fhr_ref, fhi_ref, vr_ref, vi_ref, fwr_ref, fwi_ref,
         kr_ref, ki_ref, twr_ref, twi_ref, nl_ref,
         accr, acci) = refs
    i = pl.program_id(0)
    dt = nl_ref.dtype

    def cmm(ar, ai, br, bi):  # Karatsuba complex matmul of 2-D values
        dot = partial(jnp.dot, preferred_element_type=dt, precision=precision)
        p1 = dot(ar, br)
        p2 = dot(ai, bi)
        p3 = dot(ar + ai, br + bi)
        return p1 - p2, p3 - p1 - p2

    def cmm_stacked(m_stk, br, bi):
        # sublane-parity split (x_stacked): the complex left operand rides
        # as [re; im] stacked on SUBLANES (2nx, nx) and the product runs
        # as TWO schoolbook dots of shape (2nx, nx) @ (nx, n2) instead of
        # three Karatsuba (nx, nx) dots.  4/3 the MACs, but the M=2nx=128
        # shape runs ~1.66x the M=64 rate on the 128x128 systolic array
        # (measured, benchmarks/mxu_shapes.py) — a net ~20% on this leg.
        dot = partial(jnp.dot, preferred_element_type=dt, precision=precision)
        t = dot(m_stk, br)  # [re@br ; im@br]
        u = dot(m_stk, bi)  # [re@bi ; im@bi]
        return t[:nx] - u[nx:], u[:nx] + t[nx:]

    def real_x_stacked(mr, mi, tr, ti):
        # real part of a complex left-multiply as ONE depth-2nx dot:
        # Re(M T) = mr@tr - mi@ti = [mr | -mi] @ [tr ; ti] — same MACs,
        # full 128-deep K on the systolic array
        dot = partial(jnp.dot, preferred_element_type=dt, precision=precision)
        return dot(
            jnp.concatenate([mr, -mi], axis=1),
            jnp.concatenate([tr, ti], axis=0),
        )

    kr, ki = kr_ref[:], ki_ref[:]
    vr, vi = vr_ref[:], vi_ref[:]
    n2f = float(n2)

    def yz_inverse(tr, ti):
        # (rows, N^2) modes M~ -> positions P~
        blocks = []
        for bx in range(r2):
            sl = slice(bx * s2, (bx + 1) * s2)
            br, bi = cmm(tr[:, sl], ti[:, sl], kr, ki)
            pr, pi = twr_ref[bx, :], twi_ref[bx, :]
            blocks.append((br * pr - bi * pi, br * pi + bi * pr))
        blocks = _block_dft_2d(blocks, ry, rz, 1.0)
        return (
            jnp.concatenate([p[0] for p in blocks], axis=-1),
            jnp.concatenate([p[1] for p in blocks], axis=-1),
        )

    def yz_forward(tr, ti):
        # (rows, N^2) positions P~ -> modes M~ (unnormalized forward):
        # block butterflies first, then conj twiddle, then the scaled
        # conjugate table N^2 conj(K) = kron(F_S, F_S)-with-twiddles.
        blocks = [
            (tr[:, bx * s2:(bx + 1) * s2], ti[:, bx * s2:(bx + 1) * s2])
            for bx in range(r2)
        ]
        blocks = _block_dft_2d(blocks, ry, rz, -1.0)
        outs = []
        for bx, (br, bi) in enumerate(blocks):
            pr, pi = twr_ref[bx, :], twi_ref[bx, :]
            ur = br * pr + bi * pi
            ui = bi * pr - br * pi
            outs.append(cmm(ur, ui, n2f * kr, -n2f * ki))
        return (
            jnp.concatenate([p[0] for p in outs], axis=-1),
            jnp.concatenate([p[1] for p in outs], axis=-1),
        )

    @pl.when(i == 0)
    def _():
        accr[:] = jnp.zeros_like(accr)
        acci[:] = jnp.zeros_like(acci)
        if io:
            dot = partial(
                jnp.dot, preferred_element_type=dt, precision=precision
            )
            fp = fpr_ref[:]  # (N, N^2) real, position-permuted
            if x_stacked:
                t = dot(jnp.concatenate([fwr_ref[:], fwi_ref[:]], axis=0), fp)
                fhr, fhi = yz_forward(t[:nx], t[nx:])
            else:
                fhr, fhi = yz_forward(
                    dot(fwr_ref[:], fp), dot(fwi_ref[:], fp)
                )
            fhr_s[:] = fhr
            fhi_s[:] = fhi
            b2 = b2_ref[:]
            tr, ti = yz_inverse(b2 * fhr, b2 * fhi)
            if x_stacked:
                b2f_s[:] = real_x_stacked(vr, vi, tr, ti)
            else:
                b2f_s[:] = dot(vr, tr) - dot(vi, ti)  # Re of the x inverse

    if io:
        fr, fi = fhr_s[:], fhi_s[:]
    else:
        fr, fi = fhr_ref[:], fhi_ref[:]

    nl = nl_ref[:]
    zero = jnp.zeros((nx, n2), dt)
    base = i * c

    def group_body(g, carry):
        # Im(h) is dropped EXACTLY (same theorem as the ds pipeline's
        # hadamard_wsum_half): beta1 is real and l -> -l symmetric, so the
        # anti-Hermitian FFT(i Im s) part yields a purely imaginary IFFT
        # that the final Re projection annihilates.  Halves the Hadamard
        # VPU work; the group forward's x leg becomes two plain dots.
        def sub_body(j, sr):
            off = g * gs + j * cc
            # Per-node phase rows are read one at a time (Mosaic rejects
            # dynamic multi-row sublane slices that aren't 8-aligned) and the
            # cc nodes are stacked into one tall (cc*N, N^2) matmul operand.
            t1r, t1i, t2r, t2i = [], [], [], []
            for k in range(cc):
                pr = ayzr_ref[off + k, :]
                pi = ayzi_ref[off + k, :]
                t1r.append(fr * pr - fi * pi)  # alpha1 phases
                t1i.append(fr * pi + fi * pr)
                t2r.append(fr * pr + fi * pi)  # conj(alpha1) phases
                t2i.append(fi * pr - fr * pi)
            cat = (lambda p: p[0]) if cc == 1 else partial(jnp.concatenate, axis=0)
            y1r, y1i = yz_inverse(cat(t1r), cat(t1i))
            y2r, y2i = yz_inverse(cat(t2r), cat(t2i))
            for k in range(cc):  # x inverse per node, alpha_x folded in
                rs = slice(k * nx, (k + 1) * nx)
                idx = base + off + k
                axr = axr_ref[idx, :]
                axi = axi_ref[idx, :]
                m1r = vr * axr - vi * axi
                m1i = vr * axi + vi * axr
                m2r = vr * axr + vi * axi
                m2i = vi * axr - vr * axi
                if x_stacked:
                    g1r, g1i = cmm_stacked(
                        jnp.concatenate([m1r, m1i], axis=0), y1r[rs], y1i[rs]
                    )
                    g2r, g2i = cmm_stacked(
                        jnp.concatenate([m2r, m2i], axis=0), y2r[rs], y2i[rs]
                    )
                else:
                    g1r, g1i = cmm(m1r, m1i, y1r[rs], y1i[rs])
                    g2r, g2i = cmm(m2r, m2i, y2r[rs], y2i[rs])
                w = gw_ref[idx]
                sr = sr + w * (g1r * g2r - g1i * g2i)
            return sr

        sr = jax.lax.fori_loop(0, gs // cc, sub_body, zero)
        # one forward transform per radial group (beta1 depends only on
        # rho); the group sum is real (Im dropped above)
        dot = partial(jnp.dot, preferred_element_type=dt, precision=precision)
        if x_stacked:
            # real right operand: both component dots ride one stacked
            # (2nx, nx) @ (nx, n2) product
            t = dot(jnp.concatenate([fwr_ref[:], fwi_ref[:]], axis=0), sr)
            sr, si = t[:nx], t[nx:]
        else:
            sr, si = dot(fwr_ref[:], sr), dot(fwi_ref[:], sr)
        sr, si = yz_forward(sr, si)
        arg = (coef * rho_ref[base + g * gs]) * nl + eps
        beta1 = amp * jnp.sin(arg) / arg
        accr[:] = accr[:] + beta1 * sr
        acci[:] = acci[:] + beta1 * si
        return carry

    jax.lax.fori_loop(0, c // gs, group_body, 0)

    if io:
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            dot = partial(
                jnp.dot, preferred_element_type=dt, precision=precision
            )
            tr, ti = yz_inverse(accr[:], acci[:])
            if x_stacked:
                q_gain = real_x_stacked(vr, vi, tr, ti)
            else:
                q_gain = dot(vr, tr) - dot(vi, ti)  # Re of the x inverse
            q_ref[:] = q_gain - b2f_s[:] * fpr_ref[:]


def _ct_node_blocking(b, n, nodes_per_step, radial_group, sub_batch,
                      grid_elems=None):
    """(c, cc, gs) for the ct kernel: c nodes per grid step (multiple of 8
    for the blocked (C, N^2) tables, multiple of gs for group hoisting),
    cc nodes per inner matmul sub-batch (cc | gs, VMEM-bounded).  ``n`` is
    the x-axis size (stacked-matmul row bound); ``grid_elems`` the full grid
    element count (defaults to n^3 for cubic callers)."""
    if grid_elems is None:
        grid_elems = n * n * n
    c = min(nodes_per_step, b)
    if c >= 8:
        c = (c // 8) * 8
    elif b > c:
        c = min(8, b)
    gs = math.gcd(max(radial_group, 1), c)
    if sub_batch:
        if gs % sub_batch:
            raise ValueError(
                f"fused_sub_batch={sub_batch} must divide the radial group "
                f"size {gs}"
            )
        return c, sub_batch, gs
    cc = 1
    budget = 44 << 20  # live per-node planes during the transform, ~12/node
    for cand in (8, 4, 2):
        if gs % cand == 0 and cand * n <= 512 and cand * 12 * grid_elems * 4 <= budget:
            cc = cand
            break
    return c, cc, gs


def _fused_gain_ct(
    rho, gain_w, ax, ay, az, f_hat, dft_inv, dft_fwd, norm_l,
    *, length, b_gamma, nodes_per_step, radial_group, precision, radix,
    sub_batch, f=None, beta2=None,
):
    """ct-scheme driver: returns the gain spectrum (Nx,Ny,Nz) complex, or —
    when ``f`` and ``beta2`` are given — the fully fused collision result Q
    (Nx,Ny,Nz) real with the loss term and all outer transforms in-kernel.
    ``dft_inv``/``dft_fwd`` may be shared (2,N,N) stacks or per-axis
    (x, y, z) triples (anisotropic grids, per-axis radix splits)."""
    (vx_i, vy_i, vz_i) = _as_axes(dft_inv)
    (vx_f, vy_f, vz_f) = _as_axes(dft_fwd)
    b, nx = ax.shape
    ny, nz = ay.shape[1], az.shape[1]
    ry = _ct_pick_radix(ny, radix)
    rz = _ct_pick_radix(nz, radix) if nz != ny else ry
    if not (ry and rz):
        raise ValueError(f"no ct radix split for (ny, nz)=({ny}, {nz})")
    sy, sz = ny // ry, nz // rz
    s2 = sy * sz
    r2 = ry * rz
    n2 = ny * nz
    io = f is not None

    # VMEM ceiling (see ct_vmem_bytes) — fail at trace time with the
    # actionable alternative instead of a Mosaic scoped-vmem OOM.
    if not _interpret() and ct_vmem_bytes(nx, ny, nz) > CT_VMEM_BUDGET:
        raise ValueError(
            f"grid ({nx},{ny},{nz}) exceeds the fused megakernel's VMEM "
            f"working set (~{ct_vmem_bytes(nx, ny, nz) >> 20} MB needed); "
            "use impl='rfft' (chunked staged pipeline) for grids beyond ~96^3"
        )

    c, cc, gs = _ct_node_blocking(b, nx, nodes_per_step, radial_group,
                                  sub_batch, grid_elems=nx * n2)
    if b % c:
        pad = c - b % c
        one = lambda w: jnp.ones((pad, w), ax.dtype)
        ax = jnp.concatenate([ax, one(nx)])
        ay = jnp.concatenate([ay, one(ny)])
        az = jnp.concatenate([az, one(nz)])
        rho = jnp.concatenate([rho, jnp.ones((pad,), rho.dtype)])
        gain_w = jnp.concatenate([gain_w, jnp.zeros((pad,), gain_w.dtype)])
        b += pad

    dt = jnp.float32 if f_hat is None or f_hat.dtype == jnp.complex64 else jnp.float64
    if io:
        dt = jnp.float32 if f.dtype == jnp.float32 else jnp.float64

    mp = _ct_mode_perm(ny, ry, nz, rz)
    kr_np, ki_np, twr_np, twi_np = _ct_tables(ny, ry, nz, rz)

    # combined y/z phases, built block-major in the permuted mode basis
    ayz = (ay[:, :, None] * az[:, None, :]).reshape(b, n2)[:, mp]

    eps = float(np.finfo(dt).eps)
    prec = _PRECISION_MAP[precision]
    # Sublane-parity / stacked x-dot experiment (round 5, BOLTZFFT_X_STACKED=1):
    # per-node complex x inverses run as stacked (2nx, nx) schoolbook dots,
    # real-part legs as depth-2nx K-stacked dots.  Opt-in A/B knob; the
    # measured outcome is recorded in docs/PERFORMANCE.md.
    x_stacked = os.environ.get("BOLTZFFT_X_STACKED", "0") == "1"
    kernel = partial(
        _fused_ct_kernel,
        nx=nx, ny=ny, nz=nz, ry=ry, rz=rz, c=c, cc=cc, gs=gs, io=io,
        coef=math.pi / (2.0 * length),
        amp=4.0 * math.pi * b_gamma,
        eps=eps, precision=prec, x_stacked=x_stacked,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    nodeb = lambda w: pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

    common_in = [
        smem(), smem(),
        full((b, nx)), full((b, nx)),
        nodeb(n2), nodeb(n2),
    ]
    tail_in = [
        full((nx, nx)), full((nx, nx)), full((nx, nx)), full((nx, nx)),
        full((s2, s2)), full((s2, s2)),
        full((r2, s2)), full((r2, s2)),
        full((nx, n2)),
    ]
    common_args = (
        rho.astype(dt), gain_w.astype(dt),
        jnp.real(ax).astype(dt), jnp.imag(ax).astype(dt),
        jnp.real(ayz).astype(dt), jnp.imag(ayz).astype(dt),
    )
    tail_args = (
        vx_i[0].astype(dt), vx_i[1].astype(dt),
        vx_f[0].astype(dt), vx_f[1].astype(dt),
        jnp.asarray(kr_np, dt), jnp.asarray(ki_np, dt),
        jnp.asarray(twr_np, dt), jnp.asarray(twi_np, dt),
        jnp.take(norm_l.reshape(nx, n2).astype(dt), mp, axis=1),
    )

    if io:
        pp = _ct_pos_perm(ny, ry, nz, rz)
        q = pl.pallas_call(
            kernel,
            grid=(b // c,),
            in_specs=common_in + [full((nx, n2)), full((nx, n2))] + tail_in,
            out_specs=full((nx, n2)),
            out_shape=jax.ShapeDtypeStruct((nx, n2), dt),
            scratch_shapes=[pltpu.VMEM((nx, n2), dt)] * 5,
            compiler_params=params,
            interpret=_interpret(),
        )(
            *common_args,
            jnp.take(f.reshape(nx, n2).astype(dt), pp, axis=1),
            jnp.take(beta2.reshape(nx, n2).astype(dt), mp, axis=1),
            *tail_args,
        )
        return jnp.take(q, _inv_perm(pp), axis=1).reshape(nx, ny, nz)

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(b // c,),
        in_specs=common_in + [full((nx, n2)), full((nx, n2))] + tail_in,
        out_specs=[full((nx, n2))] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx, n2), dt)] * 2,
        compiler_params=params,
        interpret=_interpret(),
    )(
        *common_args,
        jnp.take(jnp.real(f_hat).reshape(nx, n2).astype(dt), mp, axis=1),
        jnp.take(jnp.imag(f_hat).reshape(nx, n2).astype(dt), mp, axis=1),
        *tail_args,
    )
    out = out_r + 1j * out_i
    return jnp.take(out, _inv_perm(mp), axis=1).reshape(nx, ny, nz)


def fused_collide(
    rho, gain_w, ax, ay, az, f, beta2, dft_inv, dft_fwd, norm_l,
    *, length, b_gamma, nodes_per_step=24, radial_group=1,
    precision="default", radix=0, sub_batch=0,
):
    """The ENTIRE collision operator as one kernel launch (ct scheme):
    forward transform of f, all per-node work, the gain reduction, the
    beta2 loss convolution, both final inverse transforms, and the Q
    assembly run in-kernel (reference pipeline:
    ``FFTWBoltzmannOperator.cpp:147-334``).  Returns Q (N,N,N) real."""
    return _fused_gain_ct(
        rho, gain_w, ax, ay, az, None, dft_inv, dft_fwd, norm_l,
        length=length, b_gamma=b_gamma, nodes_per_step=nodes_per_step,
        radial_group=radial_group, precision=precision, radix=radix,
        sub_batch=sub_batch, f=f, beta2=beta2,
    )


def _fused_gain_kernel(
    rho_ref, gw_ref,
    axr_ref, axi_ref, ayr_ref, ayi_ref, azr_ref, azi_ref,
    fr_ref, fi_ref, vr_ref, vi_ref, wr_ref, wi_ref, nl_ref,
    or_ref, oi_ref, *, n, c, gs, coef, amp, eps, precision,
):
    """Transpose-scheme variant for grids where the Kron table does not fit
    VMEM (N > 32).  Nodes are processed one at a time inside the step (the
    phase tables live whole in VMEM and are row-indexed — (C, N) blocks would
    violate Mosaic's sublane rules for small C), with the same radial-group
    forward hoisting as the Kron kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        or_ref[:] = jnp.zeros_like(or_ref)
        oi_ref[:] = jnp.zeros_like(oi_ref)

    fr, fi = fr_ref[:], fi_ref[:]  # (N, N, N) f_hat planes
    vr, vi = vr_ref[:], vi_ref[:]
    nl = nl_ref[:]
    base = i * c
    zero = jnp.zeros_like(nl)

    # fori_loop (not unrolled python loops): the transform body is traced
    # once, keeping Mosaic compile time independent of nodes-per-step.
    # Im(h) is dropped EXACTLY (same theorem as the ds pipeline's
    # hadamard_wsum_half): beta1 is real and l -> -l symmetric, so the
    # anti-Hermitian FFT(i Im s) part yields a purely imaginary IFFT that
    # the final Re projection annihilates.
    def node_body(cc, sr):
        idx = base + cc
        ax = (axr_ref[idx, :], axi_ref[idx, :])
        ay = (ayr_ref[idx, :], ayi_ref[idx, :])
        az = (azr_ref[idx, :], azi_ref[idx, :])
        g1r, g1i = _dft3(n, vr, vi, fr, fi, px=ax, py=ay, pz=az,
                         precision=precision)
        g2r, g2i = _dft3(
            n, vr, vi, fr, fi,
            px=(ax[0], -ax[1]), py=(ay[0], -ay[1]), pz=(az[0], -az[1]),
            precision=precision,
        )
        w = gw_ref[idx]
        return sr + w * (g1r * g2r - g1i * g2i)

    def group_body(g, acc):
        acc_r, acc_i = acc
        sr = jax.lax.fori_loop(g * gs, (g + 1) * gs, node_body, zero)
        # one forward transform per radial group (beta1 depends only on
        # rho); the group sum is real (Im dropped above)
        sr, si = _dft3(n, wr_ref[:], wi_ref[:], sr, None, precision=precision)
        arg = (coef * rho_ref[base + g * gs]) * nl + eps
        beta1 = amp * jnp.sin(arg) / arg
        return (acc_r + beta1 * sr, acc_i + beta1 * si)

    acc_r, acc_i = jax.lax.fori_loop(0, c // gs, group_body, (zero, zero))
    or_ref[:] = or_ref[:] + acc_r
    oi_ref[:] = oi_ref[:] + acc_i


def fused_gain(
    rho, gain_w,  # (B,)
    ax, ay, az,  # (B, N_axis) complex separable phase factors
    f_hat,  # (Nx, Ny, Nz) complex full spectrum
    dft_inv, dft_fwd,  # (2, N, N) stacked re/im matrices, or (x, y, z) triples
    norm_l,  # (Nx, Ny, Nz) mode norms
    *, length, b_gamma, nodes_per_step: int = 8, scheme: str = "auto",
    radial_group: int = 1, precision: str = "default",
    radix: int = 0, sub_batch: int = 0,
):
    """Q_gain_hat = sum_b w_b beta1_b FFT(IFFT(a1 f^) IFFT(a2 f^)) fully fused.

    Returns the (Nx, Ny, Nz) complex gain spectrum.  ``nodes_per_step`` nodes
    are processed per grid step; everything except the initial f_hat read and
    the output accumulation stays in VMEM.  ``scheme``:

    * ``"kron"`` — transpose-free, MXU-saturating (the y/z transform is one
      (Ny*Nz)-deep Kron matmul); needs an (Ny*Nz, Ny*Nz) table in VMEM, so
      Ny*Nz <= 1024 (N <= 32 cubic).
    * ``"ct"`` — Cooley-Tukey block factorization N = R*S per lane axis:
      Ry*Rz matmuls against the small kron(U_Sy, U_Sz) table + lane
      butterflies.  Any (Ny, Nz) with valid splits (S in {16, 32} on
      hardware); ``radix`` forces R, ``sub_batch`` the inner node sub-batch.
    * ``"transpose"`` — tall (N^2, N)-matmul per axis with vector transposes;
      any N, cubic grids only.
    * ``"auto"`` — kron when the table fits, else ct when radices exist,
      else transpose.
    """
    b, n = ax.shape
    ny, nz = ay.shape[1], az.shape[1]
    cubic = n == ny == nz
    if scheme == "auto":
        scheme = pick_scheme(n, ny, nz)
    if scheme == "transpose" and not cubic:
        raise ValueError(
            "fused scheme 'transpose' supports cubic grids only; use "
            "'kron'/'ct' for anisotropic resolutions"
        )

    if scheme == "ct":
        return _fused_gain_ct(
            rho, gain_w, ax, ay, az, f_hat, dft_inv, dft_fwd, norm_l,
            length=length, b_gamma=b_gamma, nodes_per_step=nodes_per_step,
            radial_group=radial_group, precision=precision,
            radix=radix, sub_batch=sub_batch,
        )

    if scheme == "kron":
        # VMEM cap: the kernel keeps ~16 (C, Nx*Ny*Nz) f32 planes live at
        # peak (g1/g2/h + transform temps), plus the 2*(NyNz)^2 Kron table.
        vmem_budget = (56 << 20) - 2 * (ny * nz) * (ny * nz) * 4
        c_cap = max(1, vmem_budget // (16 * n * ny * nz * 4))
        c = min(nodes_per_step, c_cap, b)
        if c >= 8:
            c = (c // 8) * 8  # (C, N^2) block sublanes must be a multiple of 8
        elif b > c:
            # Mosaic's sublane rule rejects (C, N^2) node blocks with C < 8
            # unless C covers the whole node axis: clamp up (the zero-weight
            # node padding below absorbs any overshoot).
            c = min(8, b)
    else:
        # per-node loop: VMEM footprint is c-independent; c only bounds the
        # unrolled kernel size
        c = min(nodes_per_step, b)
    if b % c:
        pad = c - b % c
        one = lambda w: jnp.ones((pad, w), ax.dtype)
        ax = jnp.concatenate([ax, one(n)])
        ay = jnp.concatenate([ay, one(ny)])
        az = jnp.concatenate([az, one(nz)])
        rho = jnp.concatenate([rho, jnp.ones((pad,), rho.dtype)])
        gain_w = jnp.concatenate([gain_w, jnp.zeros((pad,), gain_w.dtype)])
        b += pad

    dt = jnp.float32 if f_hat.dtype == jnp.complex64 else jnp.float64
    (vx_i, vy_i, vz_i) = _as_axes(dft_inv)
    (vx_f, _, _) = _as_axes(dft_fwd)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    nodeb = lambda w: pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)

    # Nodes sharing a radial quadrature point get one forward transform; a
    # grid step covers whole sub-groups when gs | radial_group and gs | c.
    gs = math.gcd(max(radial_group, 1), c)

    eps = float(np.finfo(dt).eps)
    prec = _PRECISION_MAP[precision]
    common = dict(
        c=c, precision=prec,
        coef=math.pi / (2.0 * length),
        amp=4.0 * math.pi * b_gamma,
        eps=eps,
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=96 << 20)

    if scheme == "kron":
        # combined (j, k) lane phases and the shared Kron transform table
        # kron(Vy_inv, Vz_inv) (per-axis matrices on anisotropic grids)
        nyz = ny * nz
        ayz = ay[:, :, None] * az[:, None, :]
        vr, vi = vx_i[0].astype(dt), vx_i[1].astype(dt)
        vyr, vyi = vy_i[0].astype(dt), vy_i[1].astype(dt)
        vzr, vzi = vz_i[0].astype(dt), vz_i[1].astype(dt)
        kr = jnp.kron(vyr, vzr) - jnp.kron(vyi, vzi)
        ki = jnp.kron(vyr, vzi) + jnp.kron(vyi, vzr)
        out_r, out_i = pl.pallas_call(
            partial(_fused_gain_kron_kernel, gs=gs, nx=n, nyz=nyz, **common),
            grid=(b // c,),
            in_specs=[
                smem(), smem(),
                nodeb(n), nodeb(n), nodeb(nyz), nodeb(nyz),
                full((n, nyz)), full((n, nyz)),
                full((n, n)), full((n, n)), full((n, n)), full((n, n)),
                full((nyz, nyz)), full((nyz, nyz)),
                full((n, nyz)),
            ],
            out_specs=[full((n, nyz)), full((n, nyz))],
            out_shape=[jax.ShapeDtypeStruct((n, nyz), dt)] * 2,
            scratch_shapes=[pltpu.VMEM((c, n, nyz), dt)] * 4,
            compiler_params=params,
            interpret=_interpret(),
        )(
            rho.astype(dt), gain_w.astype(dt),
            jnp.real(ax).astype(dt), jnp.imag(ax).astype(dt),
            jnp.real(ayz).reshape(b, nyz).astype(dt),
            jnp.imag(ayz).reshape(b, nyz).astype(dt),
            jnp.real(f_hat).reshape(n, nyz).astype(dt),
            jnp.imag(f_hat).reshape(n, nyz).astype(dt),
            vr, vi,
            vx_f[0].astype(dt), vx_f[1].astype(dt),
            kr, ki,
            norm_l.reshape(n, nyz).astype(dt),
        )
        return (out_r + 1j * out_i).reshape(n, ny, nz)

    out_r, out_i = pl.pallas_call(
        partial(_fused_gain_kernel, gs=gs, n=n, **common),
        grid=(b // c,),
        in_specs=[
            smem(), smem(),
            full((b, n)), full((b, n)), full((b, n)), full((b, n)),
            full((b, n)), full((b, n)),
            full((n, n, n)), full((n, n, n)),
            full((n, n)), full((n, n)), full((n, n)), full((n, n)),
            full((n, n, n)),
        ],
        out_specs=[full((n, n, n)), full((n, n, n))],
        out_shape=[jax.ShapeDtypeStruct((n, n, n), dt)] * 2,
        compiler_params=params,
        interpret=_interpret(),
    )(
        rho.astype(dt), gain_w.astype(dt),
        jnp.real(ax).astype(dt), jnp.imag(ax).astype(dt),
        jnp.real(ay).astype(dt), jnp.imag(ay).astype(dt),
        jnp.real(az).astype(dt), jnp.imag(az).astype(dt),
        jnp.real(f_hat).astype(dt), jnp.imag(f_hat).astype(dt),
        vx_i[0].astype(dt), vx_i[1].astype(dt),
        vx_f[0].astype(dt), vx_f[1].astype(dt),
        norm_l.astype(dt),
    )
    return out_r + 1j * out_i


# --------------------------------------------------------------------------
# alpha_multiply: a1f[b,l] = alpha1(b,l) f_hat[l], a2f[b,l] = conj(alpha1) f_hat[l]
# --------------------------------------------------------------------------


def _alpha_multiply_kernel(
    axr_ref, axi_ref, ayzr_ref, ayzi_ref, fr_ref, fi_ref,
    o1r_ref, o1i_ref, o2r_ref, o2i_ref,
):
    i = pl.program_id(0)  # node index; small factor arrays live whole in VMEM
    # m = ayz * f_hat  (flattened (jk) modes), shared across the i axis
    ayzr = ayzr_ref[i, :]
    ayzi = ayzi_ref[i, :]
    mr = ayzr * fr_ref[:] - ayzi * fi_ref[:]
    mi = ayzr * fi_ref[:] + ayzi * fr_ref[:]
    # m2 = conj(ayz) * f_hat
    m2r = ayzr * fr_ref[:] + ayzi * fi_ref[:]
    m2i = ayzr * fi_ref[:] - ayzi * fr_ref[:]
    axr = axr_ref[i, :].reshape(-1, 1)  # (N, 1) column of per-i phases
    axi = axi_ref[i, :].reshape(-1, 1)
    o1r_ref[0] = axr * mr - axi * mi
    o1i_ref[0] = axr * mi + axi * mr
    o2r_ref[0] = axr * m2r + axi * m2i
    o2i_ref[0] = axr * m2i - axi * m2r


def alpha_multiply(
    ax_r, ax_i,  # (B, N) separable x-axis phase factors
    ayz_r, ayz_i,  # (B, M2) combined y/z factors, M2 = N * n_z_modes
    f_r, f_i,  # (N, M2) flattened f_hat
):
    """Per-node phase multiply: one f_hat read produces both alpha1*f_hat and
    conj(alpha1)*f_hat, alpha assembled in-register from separable factors.

    The small per-node factor tables (B, N)/(B, M2) are held whole in VMEM and
    indexed by ``program_id`` (Mosaic rejects per-row blocks whose sublane
    count isn't a multiple of 8); only the (1, N, M2) outputs are blocked.
    """
    b, n = ax_r.shape
    m2 = f_r.shape[1]
    dt = f_r.dtype
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _alpha_multiply_kernel,
        grid=(b,),
        in_specs=[
            full(ax_r), full(ax_i), full(ayz_r), full(ayz_i),
            full(f_r), full(f_i),
        ],
        out_specs=[
            pl.BlockSpec((1, n, m2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, n, m2), dt)] * 4,
        interpret=_interpret(),
    )(ax_r, ax_i, ayz_r, ayz_i, f_r, f_i)
    return out  # (a1f_r, a1f_i, a2f_r, a2f_i)
