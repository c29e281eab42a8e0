"""Quickstart: simulate a lensless measurement and reconstruct it.

Runs entirely offline on CPU or TPU:

    LPT_PLATFORM=cpu python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import lenslesspicam_tpu as lpt
from lenslesspicam_tpu.data.io import save_image
from lenslesspicam_tpu.eval.metrics import compute_metrics
from lenslesspicam_tpu.hardware.mask import FresnelZoneAperture
from lenslesspicam_tpu.ops.fft_conv import FFTConvolver


def main():
    # 1. a physical mask design and its simulated PSF
    mask = FresnelZoneAperture.from_sensor("rpi_hq", downsample=16,
                                           distance_sensor=4e-3)
    psf = np.asarray(mask.psf)[None].astype(np.float32)  # (1, H, W, 3)
    psf = psf / np.linalg.norm(psf)

    # 2. a scene and its lensless measurement through the forward model
    rng = np.random.RandomState(0)
    h, w = psf.shape[1:3]
    scene = np.zeros((h, w, 3), np.float32)
    scene[h // 4 : h // 2, w // 4 : w // 2, 0] = 1.0
    scene[h // 2 : 3 * h // 4, w // 2 : 3 * w // 4, 1] = 0.8
    conv = FFTConvolver.from_psf(psf, pad=True, norm="backward")
    measurement = np.asarray(conv.convolve(jnp.asarray(scene[None])))
    measurement = measurement / measurement.max()

    # 3. reconstruct with ADMM and FISTA
    for name, algo in (("admm", lpt.ADMM(psf)), ("fista", lpt.FISTA(psf))):
        algo.set_data(measurement[0])
        recon = np.asarray(algo.apply(n_iter=100))
        metrics = compute_metrics(jnp.asarray(recon[None]),
                                  jnp.asarray(scene[None][None]))
        print(name, {k: round(float(v), 3) for k, v in metrics.items()})
        save_image(recon, f"quickstart_{name}.png")
        print(f"  saved quickstart_{name}.png")


if __name__ == "__main__":
    main()
