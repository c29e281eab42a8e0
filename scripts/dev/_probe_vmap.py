"""Launch-overhead hypothesis probe: time ONE kernel (e1_rtv) at 12MP
single vs vmapped x2 / x4 planes.  If per-plane time collapses toward
the ~1.2 ms stream bound as planes grow, the single-image pipeline is
bound by per-pallas-call fixed overhead (prologue/dispatch), not DMA
or matmul width — and the batch rungs are the saturated configuration.

Usage: python _probe_vmap.py [planes ...]   (default: 1 2 4)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_TV", "i16")
os.environ.setdefault("LPT_CARRY_V", "i16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
import numpy as np, jax, jax.numpy as jnp
from lenslesspicam_tpu.recon import admm_split
from lenslesspicam_tpu.ops import pallas_kernels2 as pk2

shape = (3040, 4056)
rng = np.random.RandomState(0)
psf2d = rng.rand(*shape).astype(np.float32); psf2d /= np.linalg.norm(psf2d)
data2d = rng.rand(*shape).astype(np.float32)
pre = admm_split.precompute_rsplit(psf2d, data2d)
ph, pw = pre.padded_shape
io = pk2._IO_DTYPE
tv = pk2._CARRY_TV_DTYPE
p = admm_split.ADMMParams()


def timed(fn, args, label, base=2, full=52, reps=3):
    t0 = time.time(); float(fn(*args, base))
    print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(fn(*args, full)); dt2 = time.time() - t0
        t0 = time.time(); float(fn(*args, base)); dt1 = time.time() - t0
        best = min(best, (dt2 - dt1) / (full - base))
    print(f"{label}: {best*1e3:.2f} ms/call", flush=True)
    return best


def make_loop(nplanes):
    if nplanes == 1:
        def body(_, s):
            img, aa0, aa1, bb = s
            rkr, rki, a0n, a1n, bn, _sat = pk2.e1_rtv(
                img, aa0, aa1, bb, p.mu2, p.mu3, p.tau)
            eps = (rkr[0, 0]).astype(io) * 0
            return (img + eps, a0n, a1n, bn)
    else:
        ve1 = jax.vmap(lambda i, a, b_, c: pk2.e1_rtv(
            i, a, b_, c, p.mu2, p.mu3, p.tau))

        def body(_, s):
            img, aa0, aa1, bb = s
            rkr, rki, a0n, a1n, bn, _sat = ve1(img, aa0, aa1, bb)
            eps = (rkr[0, 0, 0]).astype(io) * 0
            return (img + eps, a0n, a1n, bn)

    @jax.jit
    def loop(image, a0, a1, b, n):
        out = jax.lax.fori_loop(0, n, body, (image, a0, a1, b))
        return out[0].reshape(-1)[::499].sum().astype(jnp.float32)

    return loop


for nplanes in [int(a) for a in (sys.argv[1:] or ["1", "2", "4"])]:
    sh = (ph, pw) if nplanes == 1 else (nplanes, ph, pw)
    z_io = jnp.zeros(sh, io)
    z_tv = jnp.zeros(sh, tv)
    t = timed(make_loop(nplanes), (z_io, z_tv, z_tv, z_tv),
              f"e1_rtv x{nplanes}")
    print(f"  -> {t*1e3/nplanes:.2f} ms/plane", flush=True)
