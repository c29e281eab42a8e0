"""Offline quality-baseline harness: iteration-sweep reconstruction of
simulated measurements, written to a checked-in results.json.

Mirrors the reference's benchmark protocol
(scripts/eval/benchmark_recon.py:381-414, configs/benchmark/defaults.yaml:34):
n_iter sweep [5, 10, 20, 50, 100, 200, 300] over ADMM / FISTA / GD /
Nesterov plus the fused split-FFT backends, metrics MSE / PSNR / SSIM
against the ground-truth scene.  Needs no network or datasets: scenes
are deterministic synthetic structures and the PSF is a seeded random
point diffuser, so the numbers are reproducible bit-closely across
rounds — tests/test_quality_baseline.py asserts non-regression against
the committed benchmarks/quality_baseline.json.

Usage: python scripts/eval/quality_baseline.py [--out PATH] [--quick]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

N_ITER_SWEEP = [5, 10, 20, 50, 100, 200, 300]
SHAPE = (96, 128)


def make_scenes(shape=SHAPE):
    """Deterministic structured test scenes in [0, 1]."""
    h, w = shape
    rects = np.zeros((h, w), np.float32)
    rects[20:40, 30:60] = 1.0
    rects[50:80, 70:110] = 0.6
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    blobs = (np.exp(-((yy - 30) ** 2 + (xx - 40) ** 2) / 150.0)
             + 0.7 * np.exp(-((yy - 70) ** 2 + (xx - 90) ** 2) / 400.0)
             + 0.15 * np.sin(xx / 3.0) * np.sin(yy / 4.0) + 0.15)
    blobs = (blobs / blobs.max()).astype(np.float32)
    # "grid": thin lines + point sources — exercises TV edges
    grid = np.zeros((h, w), np.float32)
    grid[::12, :] = 0.5
    grid[:, ::16] = 0.5
    rng = np.random.RandomState(3)
    pys, pxs = rng.randint(4, h - 4, 12), rng.randint(4, w - 4, 12)
    grid[pys, pxs] = 1.0
    return {"rects": rects, "blobs": blobs, "grid": grid}


def make_psf(shape=SHAPE, seed=0):
    rng = np.random.RandomState(seed)
    h, w = shape
    psf = np.zeros((h, w), np.float32)
    ys, xs = rng.randint(0, h, 200), rng.randint(0, w, 200)
    psf[ys, xs] = rng.rand(200)
    psf /= np.linalg.norm(psf)
    return psf


def simulate(scene, psf):
    """Noiseless forward measurement (padded circular convolution),
    max-normalized like the reference's data loading."""
    import jax.numpy as jnp

    from lenslesspicam_tpu.ops.fft_conv import FFTConvolver

    fwd = FFTConvolver.from_psf(psf[None, :, :, None], pad=True,
                                norm="backward")
    meas = np.asarray(fwd.convolve(jnp.asarray(
        scene[None, None, :, :, None]))).squeeze()
    return (meas / meas.max()).astype(np.float32)


def reconstruct(algo, psf, meas, n_iter):
    import jax.numpy as jnp

    from lenslesspicam_tpu.recon import admm, admm_split, gd

    psf4 = psf[None, :, :, None]
    data5 = meas[None, None, :, :, None]
    if algo == "admm":
        conv = admm.make_convolver(psf4)
        out = admm.run_jit(conv, jnp.asarray(data5), n_iter=n_iter)
        return np.asarray(out)[0, 0, :, :, 0]
    if algo in ("fista", "gd", "nesterov"):
        method = {"gd": "vanilla"}.get(algo, algo)
        conv = gd.make_convolver(psf4)
        out = gd.run(conv, jnp.asarray(psf4), jnp.asarray(data5),
                     n_iter=n_iter, method=method)
        return np.asarray(out)[0, 0, :, :, 0]
    if algo == "admm_split":
        pre = admm_split.precompute_split(psf, meas)
        return np.asarray(admm_split.run_split_jit(
            pre, n_iter=jnp.asarray(n_iter)))
    if algo == "admm_rfused":
        pre = admm_split.precompute_rsplit(psf, meas)
        return np.asarray(admm_split.run_rsplit_jit(
            pre, n_iter=jnp.asarray(n_iter)))
    raise ValueError(algo)


def metrics_of(scene, est):
    from lenslesspicam_tpu.eval import metric

    t = scene[:, :, None]
    e = np.asarray(est, np.float32)[:, :, None]
    return {
        "mse": float(metric.mse(t, e)),
        "psnr": float(metric.psnr(t, e)),
        "ssim": float(metric.ssim(t, e)),
    }


def run_sweep(algos=None, scenes=None, sweep=None):
    scenes = scenes or make_scenes()
    psf = make_psf()
    algos = algos or ["admm", "fista", "gd", "nesterov", "admm_split",
                      "admm_rfused"]
    sweep = sweep or N_ITER_SWEEP
    results = {}
    for sname, scene in scenes.items():
        meas = simulate(scene, psf)
        results[sname] = {}
        for algo in algos:
            results[sname][algo] = {}
            for n in sweep:
                try:
                    est = reconstruct(algo, psf, meas, n)
                except Exception as e:  # pycsou-style optional backends
                    print(f"{sname}/{algo}/{n}: skipped ({e})",
                          file=sys.stderr)
                    continue
                m = metrics_of(scene, est)
                results[sname][algo][str(n)] = m
                print(f"{sname:6s} {algo:12s} n={n:3d}  "
                      f"PSNR {m['psnr']:6.2f}  SSIM {m['ssim']:.4f}",
                      file=sys.stderr)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "benchmarks",
        "quality_baseline.json"))
    ap.add_argument("--quick", action="store_true",
                    help="one scene, short sweep (smoke run)")
    args = ap.parse_args()

    if args.quick:
        results = run_sweep(algos=["admm", "fista"],
                            scenes={"rects": make_scenes()["rects"]},
                            sweep=[5, 20])
    else:
        results = run_sweep()

    payload = {
        "protocol": {
            "n_iter_sweep": N_ITER_SWEEP,
            "shape": list(SHAPE),
            "psf": "seeded 200-point random diffuser (seed 0)",
            "admm_params": "mu1=1e-6 mu2=1e-5 mu3=4e-5 tau=1e-4 "
                           "(reference defaults, lensless/recon/admm.py:39-42)",
            "reference_protocol":
                "scripts/eval/benchmark_recon.py:381-414 + "
                "configs/benchmark/defaults.yaml:34",
        },
        "results": results,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
