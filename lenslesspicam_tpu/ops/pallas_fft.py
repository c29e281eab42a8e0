"""Pallas TPU FFT: single-HBM-pass 2-D convolution spectra.

Why: XLA's TPU FFT executes one memory pass per radix stage — measured
~14 ms for a 6144x8192 rfft2 against a ~0.5 ms HBM roofline (13 radix
passes x 400 MB explains it).  The fix is to perform the whole 1-D
transform while the tile is resident in VMEM: each axis is a two-stage
Cooley-Tukey factorization (n = n1 * n2) evaluated as MXU matmuls with
precomputed DFT matrices and twiddles, so a transform costs ONE read and
ONE write of HBM.

Layout trick: the two-stage decomposition naturally produces the
"digit-split" order (true frequency k = k1 + n1 * k2 stored at position
(k1, k2)).  Re-ordering to natural order costs a full-grid transpose —
so we DON'T: convolution only needs elementwise spectrum multiplies, so
PSF spectra are pre-permuted into the same split order (a cheap one-time
numpy reindex) and the inverse kernels consume split order directly.

Kernels (complex carried as separate real/imag f32 planes — Mosaic has
no native complex):

* ``_fft_w_kernel``   — real rows in, split-order spectrum out (W axis);
* ``_fft_h_kernel``   — column tiles, H-axis transform in split order;
* ``_ifft_h_kernel``  — spectrum multiply (filter fused) + inverse H;
* ``_ifft_w_kernel``  — inverse W, real rows out.

``filtered_synthesis_pallas(x, filt_split)`` chains them:
``irfft2(rfft2(x) * H)`` bit-equivalent (to f32 tolerance) to the
XLA-FFT path.  ``spectrum_to_split(H_full)`` converts a standard
full-complex spectrum to the split order.  See tests/test_pallas_fft.py
for exactness checks and ops/fft_conv.py for how the ADMM solver uses
this backend on TPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import is TPU/CPU-interpret capable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_MXU_F32 = jnp.float32


@lru_cache(maxsize=None)
def _factor(n: int):
    """n = n1 * n2 with n2 a multiple of 128 when possible (lane axis)."""
    best = None
    for n2 in range(1, n + 1):
        if n % n2:
            continue
        n1 = n // n2
        if n1 > 512:
            continue
        lane_bonus = 0 if n2 % 128 == 0 else 512
        score = abs(n1 - n2) + lane_bonus
        if best is None or score < best[0]:
            best = (score, n1, n2)
    return best[1], best[2]


@lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    """DFT matrices and twiddles (numpy, cached; f32 pairs)."""
    n1, n2 = _factor(n)
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    F1 = np.exp(sign * n2 * np.outer(j1, j1)).astype(np.complex64)  # (k1, j1)
    F2 = np.exp(sign * n1 * np.outer(j2, j2)).astype(np.complex64)  # (j2, k2)
    T = np.exp(sign * np.outer(j1, j2)).astype(np.complex64)        # (k1, j2)
    scale = np.float32(1.0 / n if inverse else 1.0)
    return (
        F1.real.copy(), F1.imag.copy(),
        F2.real.copy(), F2.imag.copy(),
        T.real.copy(), T.imag.copy(),
        scale, n1, n2,
    )


def split_order_indices(n: int) -> np.ndarray:
    """Permutation p with split[pos] = natural[p[pos]]: position
    (k1, k2) holds frequency k1 + n1 * k2."""
    n1, n2 = _factor(n)
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k1 + n1 * k2).reshape(-1)


def spectrum_to_split(spec_full: np.ndarray, axes=(-2, -1)) -> np.ndarray:
    """Reindex a natural-order full spectrum into split order on axes."""
    out = np.asarray(spec_full)
    for ax in axes:
        idx = split_order_indices(out.shape[ax])
        out = np.take(out, idx, axis=ax)
    return out


# ---------------------------------------------------------------------------
# core complex two-stage transform on a VMEM-resident tile
# ---------------------------------------------------------------------------


def _two_stage(xr, xi, plan, contract_first: bool):
    """Transform the middle axes of (..., n1, n2)-reshaped data.

    contract_first=True contracts n1 (axis -2) then n2 (axis -1).
    Complex arithmetic on (real, imag) f32 pairs; matmuls target the MXU.
    """
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = plan
    F1r = jnp.asarray(F1r)
    F1i = jnp.asarray(F1i)
    F2r = jnp.asarray(F2r)
    F2i = jnp.asarray(F2i)
    Tr = jnp.asarray(Tr)
    Ti = jnp.asarray(Ti)

    # stage 1: contract j1 (axis -2): y[.., k1, j2] = sum_j1 F1[k1,j1] x[.., j1, j2]
    def mm1(m, v):
        return jax.lax.dot_general(
            m, v,
            dimension_numbers=(((1,), (v.ndim - 2,)), ((), ())),
            preferred_element_type=_MXU_F32,
        )

    # mm1 output has shape (k1, ...batch, j2); move k1 after batch dims
    def stage1(vr, vi):
        yr = mm1(F1r, vr) - (mm1(F1i, vi) if vi is not None else 0.0)
        yi = mm1(F1r, vi) + mm1(F1i, vr) if vi is not None else mm1(F1i, vr)
        nb = vr.ndim - 2
        perm = tuple(range(1, nb + 1)) + (0, vr.ndim - 1)
        return jnp.transpose(yr, perm), jnp.transpose(yi, perm)

    yr, yi = stage1(xr, xi)

    # twiddle (k1, j2)
    tr, ti = yr * Tr - yi * Ti, yr * Ti + yi * Tr

    # stage 2: contract j2 (axis -1): z[.., k1, k2] = sum_j2 y[.., k1, j2] F2[j2, k2]
    def stage2(vr, vi):
        zr = jax.lax.dot_general(vr, F2r, (((vr.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=_MXU_F32) - \
             jax.lax.dot_general(vi, F2i, (((vi.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=_MXU_F32)
        zi = jax.lax.dot_general(vr, F2i, (((vr.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=_MXU_F32) + \
             jax.lax.dot_general(vi, F2r, (((vi.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=_MXU_F32)
        return zr, zi

    zr, zi = stage2(tr, ti)
    if scale != 1.0:
        zr = zr * scale
        zi = zi * scale
    return zr, zi


# ---------------------------------------------------------------------------
# JAX reference implementation (same math/layout, no pallas) — used for
# correctness tests and as a fallback backend
# ---------------------------------------------------------------------------


def fft_w_split(x: jax.Array) -> tuple:
    """(M, W) real -> split-order W spectrum as (M, W) r/i planes."""
    m, w = x.shape
    plan = _plan(w, False)
    n1, n2 = plan[-2], plan[-1]
    xs = x.reshape(m, n1, n2)
    zr, zi = _two_stage(xs, None, plan, True)
    return zr.reshape(m, w), zi.reshape(m, w)


def fft_h_split(vr: jax.Array, vi: jax.Array) -> tuple:
    """(H, K) r/i -> split-order H transform, same shapes."""
    h, k = vr.shape
    plan = _plan(h, False)
    n1, n2 = plan[-2], plan[-1]
    # reshape H -> (n1, n2) with j = j1 * n2 + j2; move to (.., n1, n2)
    xr = vr.reshape(n1, n2, k).transpose(2, 0, 1)
    xi = vi.reshape(n1, n2, k).transpose(2, 0, 1)
    zr, zi = _two_stage(xr, xi, plan, True)
    return (zr.transpose(1, 2, 0).reshape(h, k),
            zi.transpose(1, 2, 0).reshape(h, k))


def ifft_h_split(vr, vi):
    h, k = vr.shape
    plan = _plan(h, True)
    n1, n2 = plan[-2], plan[-1]
    # inverse consumes split order: position (k1, k2) = freq k1 + n1 k2.
    # The forward of the INVERSE transform with swapped roles reproduces
    # natural order: x[j] = (1/n) sum_k X[k] W^{-jk}; write j = j1 n2 + j2,
    # k = k1 + n1 k2: x[j1 n2 + j2] = (1/n) sum_{k1} W_{n1}^{-j1' ...}
    # -> implemented as the mirrored two-stage with F-matrices transposed.
    xr = vr.reshape(n1, n2, k).transpose(2, 0, 1)
    xi = vi.reshape(n1, n2, k).transpose(2, 0, 1)
    zr, zi = _two_stage_inverse(xr, xi, plan)
    return (zr.transpose(1, 2, 0).reshape(h, k),
            zi.transpose(1, 2, 0).reshape(h, k))


def ifft_w_split(vr, vi):
    m, w = vr.shape
    plan = _plan(w, True)
    n1, n2 = plan[-2], plan[-1]
    xr = vr.reshape(m, n1, n2)
    xi = vi.reshape(m, n1, n2)
    zr, _ = _two_stage_inverse(xr, xi, plan)
    return zr.reshape(m, w)


def _two_stage_inverse(xr, xi, plan):
    """Inverse consuming split order (k1, k2), producing natural j order
    reshaped as (j1, j2) with j = j1 * n2 + j2.

    x[j] = (1/n) sum_{k1,k2} X[k1,k2] W^{+j(k1 + n1 k2)}
         = (1/n) sum_{k1} W_n^{j k1} ... with j = j1 n2 + j2:
      W^{j n1 k2} = W_{n2}^{j2 k2}  (since W^{n1 n2 j1 k2} = 1)
      -> inner: A[.., k1, j2] = sum_{k2} X[.., k1, k2] W_{n2}^{+j2 k2}
         twiddle: A *= W_n^{+k1 j2}
         outer: x[.., j1, j2] = sum_{k1} W_{n1}^{+j1 k1} A[.., k1, j2]
    This is exactly the forward two-stage run in reverse order, which
    equals ``_two_stage`` with the SAME inverse-plan matrices applied in
    the opposite contraction order.
    """
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = plan

    def dg(a, b, axis):
        return jax.lax.dot_general(
            a, b, (((axis,), (0,)), ((), ())),
            preferred_element_type=_MXU_F32,
        )

    F2r_ = jnp.asarray(F2r)
    F2i_ = jnp.asarray(F2i)
    # inner: contract k2 with F2[k2 -> j2] (F2 symmetric: F2[j2,k2]=F2[k2,j2])
    ar = dg(xr, F2r_, xr.ndim - 1) - dg(xi, F2i_, xi.ndim - 1)
    ai = dg(xr, F2i_, xr.ndim - 1) + dg(xi, F2r_, xi.ndim - 1)
    # now shape (.., k1, j2)
    Tr_ = jnp.asarray(Tr)
    Ti_ = jnp.asarray(Ti)
    tr = ar * Tr_ - ai * Ti_
    ti = ar * Ti_ + ai * Tr_
    # outer: contract k1 with F1 (symmetric) -> j1 leading, then move back
    F1r_ = jnp.asarray(F1r)
    F1i_ = jnp.asarray(F1i)

    def mm1(m_, v):
        return jax.lax.dot_general(
            m_, v, (((1,), (v.ndim - 2,)), ((), ())),
            preferred_element_type=_MXU_F32,
        )

    zr = mm1(F1r_, tr) - mm1(F1i_, ti)
    zi = mm1(F1r_, ti) + mm1(F1i_, tr)
    nb = tr.ndim - 2
    perm = tuple(range(1, nb + 1)) + (0, tr.ndim - 1)
    zr = jnp.transpose(zr, perm) * scale
    zi = jnp.transpose(zi, perm) * scale
    return zr, zi


# ---------------------------------------------------------------------------
# real-input half-spectrum W transform (rfft packing)
#
# Spatial rows are stored in the even/odd SPLIT LANE LAYOUT
# ``[x[0::2] | x[1::2]]`` so the classic packing p[j] = x[2j] + i x[2j+1]
# is two contiguous lane slices (no interleave shuffles anywhere).  A
# size-M = N/2 complex split-order FFT of p is unpacked to the
# half-spectrum Z[0..M-1] via
#     Z[k] = (P[k] + conj(P[M-k]))/2 - (i/2) w^k (P[k] - conj(P[M-k])),
# w = exp(-2i pi / N), with the mirror index map expressed in split-order
# coordinates (k1, k2) -> ((-k1) mod n1, n2-1-k2) (row 0: (-k2) mod n2)
# as permutation-matrix matmuls (MXU-friendly, no lane shuffles).  The
# real Nyquist bin Z[M] rides in the imaginary slot of the (real) DC
# lane (split position (0, 0)); downstream per-column H transforms are
# linear so the packed column stays separable, and the solver patches
# that single column exactly (recon/admm_split.py).
#
# Net effect: all inter-kernel spectrum planes, filter constants, and
# H-axis kernel grids HALVE vs the full-width complex path.  Matches the
# reference's rfft2 half-spectrum economy
# (/root/reference/lensless/recon/rfft_convolve.py:119-131) in the
# split-order TPU pipeline.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _rplan(n_full: int):
    """Mirror permutation matrices and pack/unpack twiddles for the
    packed real transform of full length ``n_full`` (= 2M), in the
    size-M split order.  All numpy f32."""
    assert n_full % 2 == 0
    m = n_full // 2
    n1, n2 = _factor(m)
    k = split_order_indices(m).reshape(n1, n2).astype(np.int64)
    # Q = J1 @ P gives Q[k1, :] = P[(-k1) % n1, :]
    J1 = np.zeros((n1, n1), np.float32)
    for k1 in range(n1):
        J1[k1, (-k1) % n1] = 1.0
    # (Q @ J2a)[:, k2] = Q[:, (-k2) % n2]   (row k1 = 0 of the mirror)
    # (Q @ J2b)[:, k2] = Q[:, n2 - 1 - k2]  (rows k1 >= 1)
    J2a = np.zeros((n2, n2), np.float32)
    J2b = np.zeros((n2, n2), np.float32)
    for k2 in range(n2):
        J2a[(-k2) % n2, k2] = 1.0
        J2b[n2 - 1 - k2, k2] = 1.0
    w = np.exp(-2j * np.pi * k / n_full).astype(np.complex64)   # w^{+k}
    mask00 = np.zeros((n1, n2), np.float32)
    mask00[0, 0] = 1.0
    return (J1, J2a, J2b,
            np.ascontiguousarray(w.real), np.ascontiguousarray(w.imag),
            np.ascontiguousarray(w.real), np.ascontiguousarray(-w.imag),
            mask00, n1, n2)


def to_split_layout(x):
    """(..., N) natural rows -> even/odd split layout [x[0::2] | x[1::2]]."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def from_split_layout(x):
    """Inverse of :func:`to_split_layout`."""
    m = x.shape[-1] // 2
    return jnp.stack([x[..., :m], x[..., m:]], axis=-1).reshape(
        *x.shape[:-1], 2 * m)


def _mirror_split(pr, pi, J1, J2a, J2b):
    """P_rev[k1, k2] = P at the split position of frequency (M - k) mod M
    for (rows, n1, n2) planes, via permutation matmuls."""

    def rowperm(v):
        q = jax.lax.dot_general(J1, v, (((1,), (1,)), ((), ())),
                                preferred_element_type=_MXU_F32)
        return jnp.transpose(q, (1, 0, 2))

    def laneperm(v, mat):
        return jax.lax.dot_general(v, mat, (((v.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=_MXU_F32)

    out = []
    for v in (pr, pi):
        q = rowperm(v)
        row0 = laneperm(q[:, :1, :], J2a)
        rest = laneperm(q, J2b)[:, 1:, :]
        out.append(jnp.concatenate([row0, rest], axis=1))
    return out[0], out[1]


def rfft_w_split(x_split: jax.Array) -> tuple:
    """(rows, N) real rows in even/odd split layout -> half-spectrum
    (rows, M) r/i planes in the size-M split order; Z[0] + i Z[M] packed
    at lane 0 (split position (0, 0)).  Pure-XLA reference for the
    Pallas kernel (ops/pallas_kernels2.rfft_w)."""
    rows, n_full = x_split.shape
    m = n_full // 2
    plan = _plan(m, False)
    J1, J2a, J2b, Er, Ei, _, _, mask00, n1, n2 = _rplan(n_full)
    pr = x_split[:, :m].reshape(rows, n1, n2)
    pi = x_split[:, m:].reshape(rows, n1, n2)
    Pr, Pi = _two_stage(pr, pi, plan, True)
    Rr, Ri = _mirror_split(Pr, Pi, jnp.asarray(J1), jnp.asarray(J2a),
                           jnp.asarray(J2b))
    Er = jnp.asarray(Er)
    Ei = jnp.asarray(Ei)
    Sr, Si = Pr + Rr, Pi - Ri
    Dr, Di = Pr - Rr, Pi + Ri
    Zr = 0.5 * (Sr + Er * Di + Ei * Dr)
    Zi = 0.5 * (Si - (Er * Dr - Ei * Di))
    Zi = jnp.where(jnp.asarray(mask00) > 0, Pr - Pi, Zi)   # pack Z[M]
    return Zr.reshape(rows, m), Zi.reshape(rows, m)


def irfft_w_split(zr: jax.Array, zi: jax.Array) -> jax.Array:
    """(rows, M) half-spectrum (packed lane 0) -> (rows, N) real rows in
    even/odd split layout.  Exact inverse of :func:`rfft_w_split`."""
    rows, m = zr.shape
    n_full = 2 * m
    plan = _plan(m, True)
    J1, J2a, J2b, _, _, Wr, Wi, mask00, n1, n2 = _rplan(n_full)
    Z3r = zr.reshape(rows, n1, n2)
    Z3i = zi.reshape(rows, n1, n2)
    Rr, Ri = _mirror_split(Z3r, Z3i, jnp.asarray(J1), jnp.asarray(J2a),
                           jnp.asarray(J2b))
    Er_g = 0.5 * (Z3r + Rr)
    Ei_g = 0.5 * (Z3i - Ri)
    Dr = 0.5 * (Z3r - Rr)
    Di = 0.5 * (Z3i + Ri)
    Wr = jnp.asarray(Wr)
    Wi = jnp.asarray(Wi)
    Or_g = Wr * Dr - Wi * Di
    Oi_g = Wr * Di + Wi * Dr
    m00 = jnp.asarray(mask00) > 0
    Er = jnp.where(m00, 0.5 * (Z3r + Z3i), Er_g)
    Ei = jnp.where(m00, 0.0, Ei_g)
    Or = jnp.where(m00, 0.5 * (Z3r - Z3i), Or_g)
    Oi = jnp.where(m00, 0.0, Oi_g)
    Pr = Er - Oi
    Pi = Ei + Or
    pr, pi = _two_stage_inverse(Pr, Pi, plan)
    return jnp.concatenate([pr.reshape(rows, m), pi.reshape(rows, m)], axis=1)


def spectrum_to_half_split(spec_full: np.ndarray) -> np.ndarray:
    """(H, W) natural-order full spectrum -> (H, W/2) plane with the W
    axis restricted to frequencies 0..M-1 in the size-M split order and
    the H axis in the size-H split order — the filter layout consumed by
    the half-spectrum pipeline."""
    h, w_full = np.asarray(spec_full).shape
    m = w_full // 2
    half = np.take(np.asarray(spec_full)[:, :m], split_order_indices(m), axis=1)
    return np.take(half, split_order_indices(h), axis=0)


@partial(jax.jit, static_argnames=())
def filtered_synthesis_split(x2d: jax.Array, filt_r: jax.Array, filt_i: jax.Array) -> jax.Array:
    """irfft2(rfft2(x) * H) for (M, W)-rows x (M = batch*H folded
    externally is NOT valid here — x2d is the full (H, W) grid) using the
    split-order pipeline.  filt_r/filt_i are the full-spectrum filter in
    split order on BOTH axes (spectrum_to_split)."""
    h, w = x2d.shape
    wr, wi = fft_w_split(x2d)            # W axis: rows transform
    hr, hi = fft_h_split(wr, wi)          # H axis on columns
    mr = hr * filt_r - hi * filt_i
    mi = hr * filt_i + hi * filt_r
    br, bi = ifft_h_split(mr, mi)
    return ifft_w_split(br, bi)
