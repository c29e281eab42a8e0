"""Composed-pipeline timing at 12MP: the REAL run_split_rfused loop via
the difference method, with bisection knobs (LPT_SKIP_DCPATCH, LPT_SAT)
to locate composition overhead the per-kernel probes don't see.

Usage: python _probe_pipeline.py [full|nodc|nosat|bare]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
which = sys.argv[1] if len(sys.argv) > 1 else "full"
os.environ.setdefault("LPT_SPLIT_IO", "bf16")
os.environ.setdefault("LPT_CARRY_IO", "f32")
os.environ.setdefault("LPT_CARRY_TV", "i16")
os.environ.setdefault("LPT_CARRY_V", "i16")
os.environ.setdefault("LPT_PALLAS_PRECISION", "default")
if which in ("nodc", "bare"):
    os.environ["LPT_SKIP_DCPATCH"] = "1"
if which in ("nosat", "bare"):
    os.environ["LPT_SAT"] = "0"
import numpy as np, jax, jax.numpy as jnp
from lenslesspicam_tpu.recon import admm_split

shape = (3040, 4056)
rng = np.random.RandomState(0)
psf2d = rng.rand(*shape).astype(np.float32); psf2d /= np.linalg.norm(psf2d)
data2d = rng.rand(*shape).astype(np.float32)
pre = admm_split.precompute_rsplit(psf2d, data2d)


@jax.jit
def run_sum(Hr, Hi, R, mask, dp, H0r, H0i, HMr, HMi, R0, RM, n):
    p = admm_split.RSplitPrecomp(
        Hr, Hi, R, mask, dp, H0r, H0i, HMr, HMi, R0, RM,
        pre.psf_shape, pre.padded_shape, pre.start)
    out = admm_split.run_split_rfused(p, admm_split.ADMMParams(), n)
    return jnp.sum(out[::499, ::499])


args = (pre.Hr, pre.Hi, pre.R, pre.mask, pre.data_pad,
        pre.H0r, pre.H0i, pre.HMr, pre.HMi, pre.R0, pre.RM)

t0 = time.time(); float(run_sum(*args, 2))
print(f"{which}: compile {time.time()-t0:.0f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.time(); float(run_sum(*args, 52)); dt2 = time.time() - t0
    t0 = time.time(); float(run_sum(*args, 2)); dt1 = time.time() - t0
    best = min(best, (dt2 - dt1) / 50)
print(f"{which}: {best*1e3:.2f} ms/iter ({1/best:.1f} it/s)", flush=True)
