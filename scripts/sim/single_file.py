"""Simulate a lensless measurement of one image and reconstruct it.

1) Resize the image to the PSF grid at the configured object height.
2) Convolve with the PSF (one jit FFT convolution on device).
3) Add noise at the configured SNR.
4) Reconstruct with ADMM and report MSE/PSNR/SSIM (+LPIPS when RGB and
   weights are available).

Reference: scripts/sim/single_file.py (torch/waveprop loop); here the
simulator and solver are the package's native jit paths.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                       "sim_single_file.yaml")


@config_main(_CONFIG)
def simulate(config):
    from lenslesspicam_tpu.data.image import rgb2gray
    from lenslesspicam_tpu.data.io import load_image, load_psf, save_image
    from lenslesspicam_tpu.data.simulation import FarFieldSimulator
    from lenslesspicam_tpu.eval import metric
    from lenslesspicam_tpu.recon import admm

    fp = config.files.original
    psf_fp = config.files.psf
    assert fp and os.path.exists(fp), f"File {fp} does not exist."
    assert psf_fp and os.path.exists(psf_fp), f"PSF {psf_fp} does not exist."

    sim_cfg = config.simulation
    image = load_image(fp, verbose=True).astype(np.float32)
    if sim_cfg.grayscale and image.ndim == 3:
        image = np.asarray(rgb2gray(image[None]))[0]

    psf = load_psf(psf_fp, verbose=True, downsample=sim_cfg.downsample)
    psf = np.asarray(psf, np.float32)
    if sim_cfg.grayscale and psf.shape[-1] == 3:
        psf = np.asarray(rgb2gray(psf))
    if sim_cfg.downsample > 1:
        print(f"Downsampled to {psf.shape}.")

    simulator = FarFieldSimulator(
        psf=psf,
        object_height=sim_cfg.object_height,
        scene2mask=sim_cfg.scene2mask,
        mask2sensor=sim_cfg.mask2sensor,
        sensor=sim_cfg.sensor,
        snr_db=sim_cfg.snr_db,
        max_val=sim_cfg.max_val,
    )
    image_plane, object_plane = simulator.propagate_image(
        image, return_object_plane=True)
    image_plane = np.asarray(image_plane, np.float32)
    object_plane = np.asarray(object_plane, np.float32)
    if config.save:
        save_image(object_plane, os.path.join(config.run_dir, "object_plane.png"))
        save_image(image_plane, os.path.join(config.run_dir, "image_plane.png"))

    conv = admm.make_convolver(psf)
    data = image_plane[None, None] if image_plane.ndim == 3 else \
        image_plane[None, None, :, :, None]
    recovered = np.asarray(
        admm.run_jit(conv, data, n_iter=config.admm.n_iter))[0, 0]
    if config.save:
        save_image(recovered, os.path.join(config.run_dir, "reconstruction.png"))

    print("\nEvaluation:")
    truth = object_plane if object_plane.ndim == 3 else object_plane[..., None]
    est = recovered
    print("MSE", float(metric.mse(truth, est)))
    print("PSNR", float(metric.psnr(truth, est)))
    if sim_cfg.grayscale:
        print("SSIM", float(metric.ssim(truth, est, channel_axis=None)))
    else:
        print("SSIM", float(metric.ssim(truth, est)))
        try:
            print("LPIPS", float(metric.lpips(truth, est)))
        except Exception as e:  # weights unavailable offline
            print(f"LPIPS unavailable ({e})")
    return recovered


if __name__ == "__main__":
    simulate()
