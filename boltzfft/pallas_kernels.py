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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

    # z (last) axis
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
    *, n, c, gs, coef, amp, eps, precision,
):
    """Transpose-free scheme: tensors live as (C, N, N^2) with (j,k) fused on
    the lane axis.  The y/z transform is ONE right-multiply by the shared
    Kronecker matrix Vyz = V (x) V — contraction depth N^2 keeps the MXU tiles
    completely full — and the x transform is a per-node left-multiply with the
    alpha_x phase folded into the (N, N) matrix.  No vector transposes or
    lane-crossing reshapes anywhere.  ``gs`` nodes share a radial quadrature
    point and get one forward transform (see the group-sum hoisting below).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        or_ref[:] = jnp.zeros_like(or_ref)
        oi_ref[:] = jnp.zeros_like(oi_ref)

    fr, fi = fr_ref[:], fi_ref[:]  # (N, N^2) f_hat planes
    vr, vi = vr_ref[:], vi_ref[:]
    kr, ki = kr_ref[:], ki_ref[:]  # (N^2, N^2) kron(Vinv, Vinv), symmetric

    def cmm(ar, ai, br, bi):  # Karatsuba complex matmul of 2-D values
        dot = partial(jnp.dot, preferred_element_type=ar.dtype, precision=precision)
        p1 = dot(ar, br)
        p2 = dot(ai, bi)
        p3 = dot(ar + ai, br + bi)
        return p1 - p2, p3 - p1 - p2

    def inverse(sign, out_r, out_i):
        # t = (ayz^sign) * f_hat, lane-phase per node
        pr = ayzr_ref[:].reshape(c, 1, n * n)
        pi = sign * ayzi_ref[:].reshape(c, 1, n * n)
        tr = fr * pr - fi * pi  # (C, N, N^2)
        ti = fr * pi + fi * pr
        # y/z axes: one shared full-depth Kron matmul (K symmetric)
        tr2, ti2 = cmm(tr.reshape(c * n, n * n), ti.reshape(c * n, n * n), kr, ki)
        tr2 = tr2.reshape(c, n, n * n)
        ti2 = ti2.reshape(c, n, n * n)
        # x axis: per-node left-multiply, alpha_x folded into the matrix
        for cc in range(c):
            mxr = vr * axr_ref[cc, :] - vi * (sign * axi_ref[cc, :])
            mxi = vr * (sign * axi_ref[cc, :]) + vi * axr_ref[cc, :]
            rr, ii = cmm(mxr, mxi, tr2[cc], ti2[cc])
            out_r[cc] = rr
            out_i[cc] = ii

    inverse(1.0, g1r_s, g1i_s)
    inverse(-1.0, g2r_s, g2i_s)

    hr = g1r_s[:] * g2r_s[:] - g1i_s[:] * g2i_s[:]
    hi = g1r_s[:] * g2i_s[:] + g1i_s[:] * g2r_s[:]

    # beta1 depends only on the radial node, so nodes sharing rho (the
    # spherical-design members of one radial group) are gw-weighted and
    # *summed before* the forward transform — one forward DFT per group
    # instead of per node (FFTWBoltzmannOperator.cpp:252-273 does this
    # weighting per node inside the atomics loop; linearity makes the
    # hoisting exact).
    base = i * c
    n_groups = c // gs
    fwr, fwi = fwr_ref[:], fwi_ref[:]
    n2 = float(n * n)
    nl = nl_ref[:]
    acc_r = jnp.zeros_like(nl)
    acc_i = jnp.zeros_like(nl)
    for g in range(n_groups):
        sr = jnp.zeros((n, n * n), hr.dtype)
        si = jnp.zeros((n, n * n), hi.dtype)
        for cc in range(g * gs, (g + 1) * gs):
            w = gw_ref[base + cc]
            sr = sr + w * hr[cc]
            si = si + w * hi[cc]
        # forward transform of the group sum: x axis with the shared F
        # matrix, then y/z via the conjugate-scaled Kron (F (x) F = N^2 conj K)
        sr, si = cmm(fwr, fwi, sr, si)
        sr, si = cmm(sr, si, n2 * kr, -n2 * ki)
        arg = (coef * rho_ref[base + g * gs]) * nl + eps
        beta1 = amp * jnp.sin(arg) / arg
        acc_r = acc_r + beta1 * sr
        acc_i = acc_i + beta1 * si
    or_ref[:] = or_ref[:] + acc_r
    oi_ref[:] = oi_ref[:] + acc_i


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
    def node_body(cc, s):
        sr, si = s
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
        return (sr + w * (g1r * g2r - g1i * g2i),
                si + w * (g1r * g2i + g1i * g2r))

    def group_body(g, acc):
        acc_r, acc_i = acc
        sr, si = jax.lax.fori_loop(g * gs, (g + 1) * gs, node_body, (zero, zero))
        # one forward transform per radial group (beta1 depends only on rho)
        sr, si = _dft3(n, wr_ref[:], wi_ref[:], sr, si, precision=precision)
        arg = (coef * rho_ref[base + g * gs]) * nl + eps
        beta1 = amp * jnp.sin(arg) / arg
        return (acc_r + beta1 * sr, acc_i + beta1 * si)

    acc_r, acc_i = jax.lax.fori_loop(0, c // gs, group_body, (zero, zero))
    or_ref[:] = or_ref[:] + acc_r
    oi_ref[:] = oi_ref[:] + acc_i


def fused_gain(
    rho, gain_w,  # (B,)
    ax, ay, az,  # (B, N) complex separable phase factors
    f_hat,  # (N, N, N) complex full spectrum
    dft_inv, dft_fwd,  # (2, N, N) stacked re/im transform matrices
    norm_l,  # (N, N, N) mode norms
    *, length, b_gamma, nodes_per_step: int = 8, scheme: str = "auto",
    radial_group: int = 1, precision: str = "default",
):
    """Q_gain_hat = sum_b w_b beta1_b FFT(IFFT(a1 f^) IFFT(a2 f^)) fully fused.

    Returns the (N, N, N) complex gain spectrum.  ``nodes_per_step`` nodes are
    processed per grid step; everything except the initial f_hat read and the
    output accumulation stays in VMEM.  ``scheme``:

    * ``"kron"`` — transpose-free, MXU-saturating (the y/z transform is one
      (N^2)-deep Kron matmul); needs an (N^2, N^2) table in VMEM, so N <= 32.
    * ``"transpose"`` — tall (N^2, N)-matmul per axis with vector transposes;
      works at any N.
    * ``"auto"`` — kron when it fits, else transpose.
    """
    b, n = ax.shape
    if scheme == "auto":
        # the (N^2, N^2) Kron table fits VMEM only up to N=32
        scheme = "kron" if n <= 32 else "transpose"

    if scheme == "kron":
        # VMEM cap: the kernel keeps ~16 (C, N^3) f32 planes live at peak
        # (g1/g2/h + transform temps), plus the 2*(N^2)^2 Kron table.
        vmem_budget = (56 << 20) - 2 * (n * n) * (n * n) * 4
        c_cap = max(1, vmem_budget // (16 * n * n * n * 4))
        c = min(nodes_per_step, c_cap, b)
        if c >= 8:
            c = (c // 8) * 8  # (C, N^2) block sublanes must be a multiple of 8
    else:
        # per-node loop: VMEM footprint is c-independent; c only bounds the
        # unrolled kernel size
        c = min(nodes_per_step, b)
    if b % c:
        pad = c - b % c
        one = jnp.ones((pad, n), ax.dtype)
        ax = jnp.concatenate([ax, one])
        ay = jnp.concatenate([ay, one])
        az = jnp.concatenate([az, one])
        rho = jnp.concatenate([rho, jnp.ones((pad,), rho.dtype)])
        gain_w = jnp.concatenate([gain_w, jnp.zeros((pad,), gain_w.dtype)])
        b += pad

    dt = jnp.float32 if f_hat.dtype == jnp.complex64 else jnp.float64
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    nodeb = lambda w: pl.BlockSpec((c, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)

    # Nodes sharing a radial quadrature point get one forward transform; a
    # grid step covers whole sub-groups when gs | radial_group and gs | c.
    gs = math.gcd(max(radial_group, 1), c)

    eps = float(np.finfo(dt).eps)
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    common = dict(
        n=n, c=c, precision=prec,
        coef=math.pi / (2.0 * length),
        amp=4.0 * math.pi * b_gamma,
        eps=eps,
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=96 << 20)

    if scheme == "kron":
        # combined (j, k) lane phases and the shared Kron transform table
        ayz = ay[:, :, None] * az[:, None, :]
        vr, vi = dft_inv[0].astype(dt), dft_inv[1].astype(dt)
        kr = jnp.kron(vr, vr) - jnp.kron(vi, vi)
        ki = jnp.kron(vr, vi) + jnp.kron(vi, vr)
        out_r, out_i = pl.pallas_call(
            partial(_fused_gain_kron_kernel, gs=gs, **common),
            grid=(b // c,),
            in_specs=[
                smem(), smem(),
                nodeb(n), nodeb(n), nodeb(n * n), nodeb(n * n),
                full((n, n * n)), full((n, n * n)),
                full((n, n)), full((n, n)), full((n, n)), full((n, n)),
                full((n * n, n * n)), full((n * n, n * n)),
                full((n, n * n)),
            ],
            out_specs=[full((n, n * n)), full((n, n * n))],
            out_shape=[jax.ShapeDtypeStruct((n, n * n), dt)] * 2,
            scratch_shapes=[pltpu.VMEM((c, n, n * n), dt)] * 4,
            compiler_params=params,
            interpret=_interpret(),
        )(
            rho.astype(dt), gain_w.astype(dt),
            jnp.real(ax).astype(dt), jnp.imag(ax).astype(dt),
            jnp.real(ayz).reshape(b, n * n).astype(dt),
            jnp.imag(ayz).reshape(b, n * n).astype(dt),
            jnp.real(f_hat).reshape(n, n * n).astype(dt),
            jnp.imag(f_hat).reshape(n, n * n).astype(dt),
            vr, vi,
            dft_fwd[0].astype(dt), dft_fwd[1].astype(dt),
            kr, ki,
            norm_l.reshape(n, n * n).astype(dt),
        )
        return (out_r + 1j * out_i).reshape(n, n, n)

    out_r, out_i = pl.pallas_call(
        partial(_fused_gain_kernel, gs=gs, **common),
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
        dft_inv[0].astype(dt), dft_inv[1].astype(dt),
        dft_fwd[0].astype(dt), dft_fwd[1].astype(dt),
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
