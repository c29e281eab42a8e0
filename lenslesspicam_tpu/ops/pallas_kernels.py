"""Hand-written Pallas TPU kernels for the split-order FFT pipeline.

Each kernel performs a complete 1-D transform (two MXU matmul stages +
twiddle) on a VMEM-resident tile — ONE HBM read and ONE HBM write per
axis, versus XLA FFT's pass-per-radix-stage.  The dot_general
formulation is transpose-free:

    stage 1:  y[b, j2, k1] = sum_j1 x[b, j1, j2] F1[k1, j1]
              (dot_general contracting axis 1 with F1 axis 1)
    twiddle:  y *= T[k1, j2]^T
    stage 2:  z[b, k1, k2] = sum_j2 y[b, j2, k1] F2[j2, k2]
              (dot_general contracting axis 1 with F2 axis 0)

Output arrives directly in (k1, k2) split order (see ops/pallas_fft.py
for the layout contract).  Complex data travels as separate real/imag
f32 planes (Mosaic has no complex dtype); DFT matrices and twiddles are
kernel inputs broadcast to every grid step.

``filtered_synthesis_pallas`` chains fft_w -> fft_h -> (filter-fused)
ifft_h -> ifft_w.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fft import _plan

_INTERPRET = False  # set True for CPU debugging


def _set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


def _mats(n, inverse):
    """(F1r, F1i, F2r, F2i, TrT, TiT, scale, n1, n2) as jnp arrays."""
    F1r, F1i, F2r, F2i, Tr, Ti, scale, n1, n2 = _plan(n, inverse)
    return (jnp.asarray(F1r), jnp.asarray(F1i), jnp.asarray(F2r),
            jnp.asarray(F2i), jnp.asarray(np.ascontiguousarray(Tr.T)),
            jnp.asarray(np.ascontiguousarray(Ti.T)), float(scale), n1, n2)


def _dg(a, b, a_axis, b_axis):
    return jax.lax.dot_general(
        a, b, (((a_axis,), (b_axis,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _two_stage_tile(xr, xi, F1r, F1i, F2r, F2i, TrT, TiT, scale):
    """(B, n1, n2) r/i tile -> (B, n1, n2) split-order transform."""
    yr = _dg(xr, F1r, 1, 1) - (_dg(xi, F1i, 1, 1) if xi is not None else 0.0)
    yi = _dg(xr, F1i, 1, 1) + (_dg(xi, F1r, 1, 1) if xi is not None else 0.0)
    tr = yr * TrT - yi * TiT
    ti = yr * TiT + yi * TrT
    zr = _dg(tr, F2r, 1, 0) - _dg(ti, F2i, 1, 0)
    zi = _dg(tr, F2i, 1, 0) + _dg(ti, F2r, 1, 0)
    if scale != 1.0:
        zr = zr * scale
        zi = zi * scale
    return zr, zi


def _inverse_tile(xr, xi, F1r, F1i, F2r, F2i, TrT, TiT, scale):
    """Inverse consuming split order (pallas_fft._two_stage_inverse)."""
    ar = _dg(xr, F2r, 2, 0) - _dg(xi, F2i, 2, 0)
    ai = _dg(xr, F2i, 2, 0) + _dg(xi, F2r, 2, 0)
    Tr = TrT.T
    Ti = TiT.T
    tr = ar * Tr - ai * Ti
    ti = ar * Ti + ai * Tr
    zr = _dg(tr, F1r, 1, 1) - _dg(ti, F1i, 1, 1)   # (B, j2, j1)
    zi = _dg(tr, F1i, 1, 1) + _dg(ti, F1r, 1, 1)
    zr = jnp.swapaxes(zr, 1, 2) * scale
    zi = jnp.swapaxes(zi, 1, 2) * scale
    return zr, zi


def _mat_specs(n1, n2):
    """BlockSpecs for (F1r, F1i, F2r, F2i, TrT, TiT) broadcast inputs."""
    return [
        pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# W axis (rows): x (M, W)
# ---------------------------------------------------------------------------


def _w_fwd_kernel(n1, n2, scale, x_ref, f1r, f1i, f2r, f2i, trt, tit,
                  or_ref, oi_ref):
    br = x_ref.shape[0]
    xs = x_ref[:].reshape(br, n1, n2)
    zr, zi = _two_stage_tile(xs, None, f1r[:], f1i[:], f2r[:], f2i[:],
                             trt[:], tit[:], scale)
    or_ref[:] = zr.reshape(br, n1 * n2)
    oi_ref[:] = zi.reshape(br, n1 * n2)


def _w_inv_kernel(n1, n2, scale, vr_ref, vi_ref, f1r, f1i, f2r, f2i, trt, tit,
                  out_ref):
    br = vr_ref.shape[0]
    xr = vr_ref[:].reshape(br, n1, n2)
    xi = vi_ref[:].reshape(br, n1, n2)
    zr, _ = _inverse_tile(xr, xi, f1r[:], f1i[:], f2r[:], f2i[:],
                          trt[:], tit[:], scale)
    out_ref[:] = zr.reshape(br, n1 * n2)


def fft_w_pallas(x: jax.Array, block_rows: int = 64):
    m, w = x.shape
    F1r, F1i, F2r, F2i, TrT, TiT, scale, n1, n2 = _mats(w, False)
    spec = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_fwd_kernel, n1, n2, scale),
        grid=(m // block_rows,),
        in_specs=[spec] + _mat_specs(n1, n2),
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((m, w), jnp.float32),
                   jax.ShapeDtypeStruct((m, w), jnp.float32)),
        interpret=_INTERPRET,
    )(x, F1r, F1i, F2r, F2i, TrT, TiT)


def ifft_w_pallas(vr: jax.Array, vi: jax.Array, block_rows: int = 64):
    m, w = vr.shape
    F1r, F1i, F2r, F2i, TrT, TiT, scale, n1, n2 = _mats(w, True)
    spec = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_w_inv_kernel, n1, n2, scale),
        grid=(m // block_rows,),
        in_specs=[spec, spec] + _mat_specs(n1, n2),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.float32),
        interpret=_INTERPRET,
    )(vr, vi, F1r, F1i, F2r, F2i, TrT, TiT)


# ---------------------------------------------------------------------------
# H axis (columns): v (H, K); transform along H within a K tile
# ---------------------------------------------------------------------------


def _h_fwd_kernel(n1, n2, scale, h, vr_ref, vi_ref, f1r, f1i, f2r, f2i,
                  trt, tit, or_ref, oi_ref):
    bk = vr_ref.shape[1]
    xr = vr_ref[:].reshape(n1, n2, bk).transpose(2, 0, 1)
    xi = vi_ref[:].reshape(n1, n2, bk).transpose(2, 0, 1)
    zr, zi = _two_stage_tile(xr, xi, f1r[:], f1i[:], f2r[:], f2i[:],
                             trt[:], tit[:], scale)
    or_ref[:] = zr.transpose(1, 2, 0).reshape(h, bk)
    oi_ref[:] = zi.transpose(1, 2, 0).reshape(h, bk)


def _h_inv_kernel(n1, n2, scale, h, fuse_filter, vr_ref, vi_ref, *rest):
    if fuse_filter:
        fr_ref, fi_ref = rest[0], rest[1]
        mats = rest[2:8]
        or_ref, oi_ref = rest[8], rest[9]
        vr = vr_ref[:] * fr_ref[:] - vi_ref[:] * fi_ref[:]
        vi = vr_ref[:] * fi_ref[:] + vi_ref[:] * fr_ref[:]
    else:
        mats = rest[0:6]
        or_ref, oi_ref = rest[6], rest[7]
        vr, vi = vr_ref[:], vi_ref[:]
    bk = vr.shape[1]
    xr = vr.reshape(n1, n2, bk).transpose(2, 0, 1)
    xi = vi.reshape(n1, n2, bk).transpose(2, 0, 1)
    zr, zi = _inverse_tile(xr, xi, mats[0][:], mats[1][:], mats[2][:],
                           mats[3][:], mats[4][:], mats[5][:], scale)
    or_ref[:] = zr.transpose(1, 2, 0).reshape(h, bk)
    oi_ref[:] = zi.transpose(1, 2, 0).reshape(h, bk)


def fft_h_pallas(vr: jax.Array, vi: jax.Array, block_cols: int = 64):
    h, k = vr.shape
    F1r, F1i, F2r, F2i, TrT, TiT, scale, n1, n2 = _mats(h, False)
    spec = pl.BlockSpec((h, block_cols), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_h_fwd_kernel, n1, n2, scale, h),
        grid=(k // block_cols,),
        in_specs=[spec, spec] + _mat_specs(n1, n2),
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((h, k), jnp.float32),
                   jax.ShapeDtypeStruct((h, k), jnp.float32)),
        interpret=_INTERPRET,
    )(vr, vi, F1r, F1i, F2r, F2i, TrT, TiT)


def ifft_h_pallas(vr, vi, filt_r=None, filt_i=None, block_cols: int = 64):
    h, k = vr.shape
    F1r, F1i, F2r, F2i, TrT, TiT, scale, n1, n2 = _mats(h, True)
    spec = pl.BlockSpec((h, block_cols), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    fuse = filt_r is not None
    data_ins = [vr, vi] + ([filt_r, filt_i] if fuse else [])
    return pl.pallas_call(
        partial(_h_inv_kernel, n1, n2, scale, h, fuse),
        grid=(k // block_cols,),
        in_specs=[spec] * len(data_ins) + _mat_specs(n1, n2),
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((h, k), jnp.float32),
                   jax.ShapeDtypeStruct((h, k), jnp.float32)),
        interpret=_INTERPRET,
    )(*data_ins, F1r, F1i, F2r, F2i, TrT, TiT)


def _divisor_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    b = min(target, n)
    while n % b:
        b -= 1
    return b


@jax.jit
def filtered_synthesis_pallas(x: jax.Array, filt_r: jax.Array, filt_i: jax.Array):
    """irfft2(rfft2(x) * H) on (H, W) with split-order filter planes."""
    h, w = x.shape
    br_ = _divisor_block(h, 64)
    bc_ = _divisor_block(w, 64)
    wr, wi = fft_w_pallas(x, block_rows=br_)
    hr, hi = fft_h_pallas(wr, wi, block_cols=bc_)
    br, bi = ifft_h_pallas(hr, hi, filt_r, filt_i, block_cols=bc_)
    return ifft_w_pallas(br, bi, block_rows=br_)
