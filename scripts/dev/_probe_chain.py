"""Chained-kernel probes at 12MP: measure kernel PAIRS with outputs
properly consumed by the next kernel (the isolated per-kernel loops
leave their big outputs unconsumed, so consecutive loop iterations can
overlap — they under-report the serialized cost the real ADMM chain
pays).  Usage: python _probe_chain.py [e1hcd|e1only]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_IO", "f32")
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
p = admm_split.ADMMParams()
Hr_c, Hi_c, R_c = (jnp.asarray(pre.Hr, io), jnp.asarray(pre.Hi, io),
                   jnp.asarray(pre.R, io))


def timed(fn, args, label, base=2, full=52, reps=3):
    t0 = time.time(); float(fn(*args, base))
    print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(fn(*args, full)); dt2 = time.time() - t0
        t0 = time.time(); float(fn(*args, base)); dt1 = time.time() - t0
        best = min(best, (dt2 - dt1) / (full - base))
    print(f"{label}: {best*1e3:.2f} ms/iter ({1/best:.1f} it/s)", flush=True)


@jax.jit
def loop_e1hcd(image, a0, a1, b, n):
    """e1 -> full H combine chain, with the H chain's outputs fed back
    into e1's image input (bitcast (n-shaped) consumption: every kernel
    truly waits on its predecessor, like the real solver)."""
    def body(_, s):
        img, aa0, aa1, bb = s
        rkr, rki, a0n, a1n, bn, _sat = pk2.e1_rtv(img, aa0, aa1, bb,
                                                  p.mu2, p.mu3, p.tau)
        (x0r, x0i), (x1r, x1i) = pk2.fft_h_combine_dual(
            rkr, rki, rkr, rki, Hr_c, Hi_c, R_c, ph)
        # consume the H-chain outputs as e1's next image (same shape
        # after lane-concat of the two half planes)
        img2 = jnp.concatenate([x0r, x1r], axis=1).astype(img.dtype)
        return (img2, a0n, a1n, bn)
    out = jax.lax.fori_loop(0, n, body, (image, a0, a1, b))
    return out[0][::499, ::499].sum().astype(jnp.float32)


@jax.jit
def loop_e1c(image, a0, a1, b, n):
    """e1 alone but with rk CONSUMED into the next image (serialized,
    unlike _probe_v3's eps*0 form)."""
    def body(_, s):
        img, aa0, aa1, bb = s
        rkr, rki, a0n, a1n, bn, _sat = pk2.e1_rtv(img, aa0, aa1, bb,
                                                  p.mu2, p.mu3, p.tau)
        img2 = jnp.concatenate([rkr, rki], axis=1).astype(img.dtype)
        return (img2, a0n, a1n, bn)
    out = jax.lax.fori_loop(0, n, body, (image, a0, a1, b))
    return out[0][::499, ::499].sum().astype(jnp.float32)


z_io = jnp.zeros((ph, pw), io)
z_tv = jnp.zeros((ph, pw), pk2._CARRY_TV_DTYPE)
which = sys.argv[1] if len(sys.argv) > 1 else "e1hcd"
if which == "e1hcd":
    timed(loop_e1hcd, (z_io, z_tv, z_tv, z_tv), "e1+hcd chained")
else:
    timed(loop_e1c, (z_io, z_tv, z_tv, z_tv), "e1 consumed")
