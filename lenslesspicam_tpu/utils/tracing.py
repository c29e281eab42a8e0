"""Profiling and tracing utilities.

The reference has only wall-clock profile scripts (profile/*.py, SURVEY
§5.1).  Here profiling is first-class:

* ``trace(log_dir)`` — context manager around ``jax.profiler`` traces
  (view in TensorBoard / Perfetto);
* ``time_fn`` — compile-aware wall-clock timing of a jit function
  (difference method to cancel per-call overhead);
* ``roofline_report`` — bandwidth-bound roofline accounting for the
  ADMM iteration: bytes moved per iteration vs achieved it/s -> fraction
  of speed-of-light HBM bandwidth.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lpt_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, repeats: int = 5, **kwargs) -> float:
    """Best wall-clock seconds over repeats (post-compile)."""
    import jax

    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best


def admm_bytes_per_iter(padded_shape, channels=1, dtype_bytes=4) -> int:
    """HBM traffic estimate for one ADMM iteration on the padded grid.

    Counts reads+writes of the state arrays across the fused update
    chains and the 6 rFFT/irFFT passes (each FFT ~ 2x grid traffic for
    the real side + 1x for the half-complex side).
    """
    d, ph, pw = padded_shape[0], padded_shape[1], padded_shape[2]
    grid = d * ph * pw * channels * dtype_bytes
    half = grid  # complex64 half-spectrum ~ same bytes as real grid
    # elementwise: U/X/W/image/dual updates touch ~22 grid-sized arrays
    elementwise = 22 * grid
    # 6 FFTs: input + output each
    ffts = 6 * (grid + half)
    return elementwise + ffts


def fused_admm_bytes_per_iter(padded_shape, io_bytes=2, half_spectrum=True,
                              channels=1) -> int:
    """HBM traffic of one iteration of the FUSED Pallas ADMM pipeline
    (recon/admm_split.run_split_rfused / run_split_fused), counted from
    the kernel block specs:

    e1 (carry-rebuild): reads image x3 (halo refs) + fwd + mask + dp
        (io) and the {v, b, a0 x2 (halo), a1} carries (f32); writes rk/v
        spectra (4 planes, io) + {v', a0', a1', b'} (f32).  The
        accumulating duals xi/rho/eta/u are rebuilt in-kernel and never
        cross HBM.
    combine_dual: 2x forward pass-A (8) + one fused stage-2 kernel
        (7 in, 4 out) + 2x inverse pass-A (8) — the rk spectrum, the
        combined spectrum F, and the second H read never cross HBM
    dual:    passB 8 + 2x passA 8 spectrum planes (io)
    e2 (pure dual W-inverse): reads 4 spectra, writes image/fwd (io).

    half_spectrum=True halves every spectrum plane (packed-real path).
    """
    d, ph, pw = padded_shape[0], padded_shape[1], padded_shape[2]
    a = d * ph * pw * channels            # elements per full plane
    h = 0.5 if half_spectrum else 1.0     # spectrum plane scale
    import os
    v3 = (half_spectrum
          and os.environ.get("LPT_RFUSED_V3", "1") != "0")
    if v3:
        # v3 placement: fwd never crosses HBM (X/v chain inside the dual
        # W-inverse), halos via 8-row stripe refs of the same planes
        # (2 io stripes on image + 1 carry stripe on a0 at br=32)
        io_planes = (1 + 2 * h            # e1: image read + rk spectra
                     + 8 * h              # 2x forward pass-A
                     + 11 * h             # combine_dual kernel (7 in, 4 out)
                     + 8 * h              # 2x inverse pass-A
                     + 4 * h + 2          # e2: 4 spectra in, mask+dp
                     + 1 + 2 * h          # e2: image out + v' spectra
                     + 2 * 8 / 32)        # image halo stripes
        carry_planes = 6 + 2 + 8 / 32     # e1 a0/a1/b r+w, e2 v r+w, a0 stripe
    else:
        io_planes = (6 + 4 * h            # e1 reads + spectrum writes
                     + 8 * h              # 2x forward pass-A
                     + 11 * h             # combine_dual kernel (7 in, 4 out)
                     + 8 * h              # 2x inverse pass-A
                     + 4 * h + 2)         # e2 dual inverse
        carry_planes = 5 + 4              # e1 carry reads + writes
    carry_bytes = (2 if os.environ.get("LPT_CARRY_IO", "").lower() == "bf16"
                   else 4)
    tv_bytes = (2 if os.environ.get("LPT_CARRY_TV", "").lower()
                in ("i16", "bf16") else carry_bytes)
    v_bytes = (2 if os.environ.get("LPT_CARRY_V", "").lower()
               in ("i16", "bf16") else carry_bytes)
    if v3:
        v_planes = 2                       # e2 v r+w
        tv_planes = carry_planes - v_planes
    else:
        v_planes = 2
        tv_planes = carry_planes - v_planes
    b2 = a * (io_planes * io_bytes if io_bytes == 2 else 0)
    b4 = a * (io_planes * io_bytes if io_bytes == 4 else 0)
    for planes, nbytes in ((v_planes, v_bytes), (tv_planes, tv_bytes)):
        if nbytes == 2:
            b2 += a * planes * nbytes
        else:
            b4 += a * planes * nbytes
    return int(b2 + b4), int(b2), int(b4)


def fused_admm_matmuls_per_iter(ph: int, pw: int) -> int:
    """MXU matmul-invocation count of one iteration of the v3
    half-spectrum fused pipeline, from the kernel structure:

    * e1_rtv: one packed-real forward W core per grid step — 4 stage-1
      + 4 stage-2 + 10 mirror-fold matmuls = 18;
    * irfft_w_dual_state: one (concat-fused) inverse core (4 A-chain +
      8 R(W)-chain + 8 batched final = 20) + one forward core (18);
    * pass-A pairs (forward and inverse): 4 matmuls per step;
    * combine_dual: 8 matmuls per step with concat-fusion, 16 without.

    Grid-step counts come from the live block-size knobs, so the model
    tracks tuning.  This invocation count drives the second roofline
    term: at 12MP the measured co-bottleneck is per-matmul issue/relayout
    latency, not HBM bytes (NOTES.md round-2 null result).
    """
    import os

    from ..ops.pallas_fft import _factor
    from ..ops import pallas_kernels2 as pk2

    mh = pw // 2
    n1h, n2h = _factor(ph)
    br1 = pk2._e_block_rows_v3(ph, pw, "E1R")
    br2 = pk2._e_block_rows_v3(ph, pw, "E2R")
    bj = min(int(os.environ.get("LPT_PALLAS_BJ", "32")), n2h)
    bw = min(int(os.environ.get("LPT_PALLAS_BW", "128")), mh)
    kb = min(int(os.environ.get("LPT_PALLAS_KB", "8")), n1h)
    concat = os.environ.get("LPT_CONCAT_FUSE", "1") != "0"
    kstack = os.environ.get("LPT_KSTACK", "1") != "0"

    fwd_core = 9 if kstack else 18     # packed-real W forward
    inv_core = 8 if kstack else 20     # packed-real W inverse
    e1 = (ph // br1) * fwd_core
    e2 = (ph // br2) * ((inv_core if concat else 2 * inv_core) + fwd_core)
    passa_steps = (n2h // bj) * (mh // bw)
    passa = (2 if concat else 4) * passa_steps * (2 if kstack else 4)
    s2 = 2 if kstack else 4            # matmuls per stage-2 contraction
    combine = (n1h // kb) * (mh // bw) * (2 if concat else 4) * s2
    return e1 + e2 + passa + combine


def roofline_report(shape=(3040, 4056), iters_per_s=None, channels=1,
                    hbm_bw=8.2e11, half_spectrum=True,
                    mm_issue_us=None) -> dict:
    """Two-term roofline for the fused ADMM iteration.

    Term 1: HBM bytes moved / bandwidth (hbm_bw defaults to TPU v5e,
    ~820 GB/s).  Term 2: MXU issue latency — matmul invocations x a
    per-invocation overhead (default 0.33 us, calibrated from the
    round-2 TPU measurement: 103.3 it/s at 3.05 GB/iter left 5.9 ms of
    non-bandwidth time over ~18k matmul invocations; override with
    LPT_MM_ISSUE_US).  The combined bound is max(term1, term2) — the
    pure-HBM SOL understates the work at these shapes, where thousands
    of small (K<=128) matmuls are latency- not throughput-bound.
    """
    from ..ops.padding import padded_size

    ph = padded_size(shape[0])
    pw = padded_size(shape[1])
    import os
    io_bytes = 2 if os.environ.get("LPT_SPLIT_IO", "").lower() == "bf16" else 4
    bytes_per_iter, b2, b4 = fused_admm_bytes_per_iter(
        (1, ph, pw), io_bytes, half_spectrum=half_spectrum,
        channels=channels)
    if mm_issue_us is None:
        mm_issue_us = float(os.environ.get("LPT_MM_ISSUE_US", "0.33"))
    matmuls = fused_admm_matmuls_per_iter(ph, pw) * channels
    # dtype-aware bandwidths: measured with scripts/dev/_probe_bw.py on
    # this v5e — 2-byte Pallas streaming sustains ~870 GB/s (near the
    # 820 spec) while 4-byte sustains only ~390 GB/s; override with
    # LPT_BW_2B / LPT_BW_4B
    bw2 = float(os.environ.get("LPT_BW_2B", "8.7e11"))
    bw4 = float(os.environ.get("LPT_BW_4B", "3.9e11"))
    t_bytes = b2 / bw2 + b4 / bw4
    t_mxu = matmuls * mm_issue_us * 1e-6
    t_combined = max(t_bytes, t_mxu)
    out = {
        "padded_shape": (ph, pw),
        "bytes_per_iter": bytes_per_iter,
        "bytes_2B": b2,
        "bytes_4B": b4,
        "sol_iters_per_s": 1.0 / t_bytes,
        "matmuls_per_iter": matmuls,
        "mxu_issue_iters_per_s": 1.0 / t_mxu,
        "combined_bound_iters_per_s": 1.0 / t_combined,
    }
    if iters_per_s is not None:
        out["achieved_iters_per_s"] = iters_per_s
        out["fraction_of_sol"] = iters_per_s * t_bytes
        out["fraction_of_combined"] = iters_per_s * t_combined
    return out
