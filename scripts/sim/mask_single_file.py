"""Simulate a mask, measure one image through it, and reconstruct.

1) Build the mask (MURA/MLS coded aperture, Fresnel zone aperture, or
   phase contour) from the sensor geometry.
2) Simulate the measurement — far-field PSF convolution, or the
   separable FlatCam model for coded apertures (mask.simulate).
3) Reconstruct with separable Tikhonov (FlatCam, arXiv:1509.00116 Eq 7)
   or ADMM, and report metrics.

Example:
    python scripts/sim/mask_single_file.py mask.type=MLS \
        simulation.flatcam=True recon.algo=tikhonov \
        files.original=<img.png>

Reference: scripts/sim/mask_single_file.py.
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                       "sim_mask_single.yaml")


def build_mask(config):
    from lenslesspicam_tpu.hardware.mask import (CodedAperture,
                                                 FresnelZoneAperture,
                                                 PhaseContour)

    mask_type = config.mask.type
    sensor = config.simulation.sensor
    downsample = config.simulation.downsample
    mask2sensor = float(config.simulation.mask2sensor)
    if mask_type.upper() in ("MURA", "MLS"):
        return CodedAperture.from_sensor(
            sensor_name=sensor, downsample=downsample, method=mask_type.upper(),
            n_bits=int(config.mask.n_bits), distance_sensor=mask2sensor)
    if mask_type.upper() == "FZA":
        return FresnelZoneAperture.from_sensor(
            sensor_name=sensor, downsample=downsample,
            distance_sensor=mask2sensor)
    if mask_type.lower() == "phasecontour":
        return PhaseContour.from_sensor(
            sensor_name=sensor, downsample=downsample,
            n_iter=int(config.mask.phase_mask_iter),
            distance_sensor=mask2sensor)
    raise ValueError(f"unknown mask type {mask_type!r}")


@config_main(_CONFIG)
def simulate(config):
    from lenslesspicam_tpu.data.image import rgb2bayer, rgb2gray
    from lenslesspicam_tpu.data.io import load_image, save_image
    from lenslesspicam_tpu.data.simulation import FarFieldSimulator
    from lenslesspicam_tpu.eval import metric
    from lenslesspicam_tpu.recon import admm
    from lenslesspicam_tpu.recon.tikhonov import CodedApertureReconstruction

    fp = config.files.original
    assert fp and os.path.exists(fp), f"File {fp} does not exist."
    sim_cfg = config.simulation
    image_format = str(sim_cfg.image_format).lower()
    bayer = image_format not in ("grayscale", "rgb")

    # 1) simulate mask
    mask = build_mask(config)
    psf = np.asarray(mask.psf, np.float32)
    psf = psf / psf.sum()

    # 2) simulate measurement
    image = load_image(fp).astype(np.float32) / 255.0
    flatcam_sim = bool(sim_cfg.flatcam)
    if flatcam_sim and config.mask.type.upper() not in ("MURA", "MLS"):
        warnings.warn("FlatCam simulation only supported for MURA/MLS; "
                      "using far-field PSF simulation.")
        flatcam_sim = False

    simulator = FarFieldSimulator(
        psf=psf[None],
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

    if image_format == "grayscale":
        image_plane = np.asarray(rgb2gray(image_plane))
        object_plane = np.asarray(rgb2gray(object_plane))
    elif bayer:
        pattern = image_format[-4:]
        image_plane = np.asarray(rgb2bayer(image_plane, pattern=pattern))
        object_plane = np.asarray(rgb2bayer(object_plane, pattern=pattern))

    if flatcam_sim:
        image_plane = np.asarray(
            mask.simulate(object_plane, snr_db=sim_cfg.snr_db))

    if config.save:
        save_image(object_plane, os.path.join(config.run_dir, "original.png"))
        save_image(image_plane, os.path.join(config.run_dir, "lensless.png"))
        save_image(psf, os.path.join(config.run_dir, "psf.png"))

    # 3) reconstruct
    algo = str(config.recon.algo).lower()
    if algo == "tikhonov":
        recon = CodedApertureReconstruction(
            mask, object_plane.shape, lmbd=float(config.recon.tikhonov.reg))
        recovered = np.asarray(recon.apply(image_plane))
    elif algo == "admm":
        if bayer:
            raise ValueError("ADMM reconstruction not supported for Bayer.")
        psf5 = psf[None] if psf.ndim == 3 else psf[None, :, :, None]
        data = image_plane[None, None] if image_plane.ndim == 3 else \
            image_plane[None, None, :, :, None]
        conv = admm.make_convolver(psf5.astype(np.float32))
        recovered = np.asarray(
            admm.run_jit(conv, data, n_iter=int(config.recon.admm.n_iter)))[0, 0]
    else:
        raise ValueError(f"unknown recon algo {algo!r}")

    if config.save:
        save_image(recovered, os.path.join(config.run_dir, "reconstruction.png"))

    print("\nEvaluation:")
    truth = np.squeeze(object_plane)
    est = np.squeeze(np.asarray(recovered, np.float32))
    if est.shape != truth.shape:  # e.g. Tikhonov at mask resolution
        import cv2

        est = cv2.resize(est, (truth.shape[1], truth.shape[0]))
    channel_axis = 2 if truth.ndim == 3 else None
    print("MSE", float(metric.mse(truth, est)))
    print("PSNR", float(metric.psnr(truth, est)))
    print("SSIM", float(metric.ssim(truth, est, channel_axis=channel_axis)))
    return est


if __name__ == "__main__":
    simulate()
