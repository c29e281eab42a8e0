"""Simulate the DigiCam PSF from a programmable-mask pattern.

1) Load the full-grid (3, H, W) pattern, mask it to the configured
   aperture, and extract the controllable subregion.
2) Place the cell values on the sensor grid and propagate to the
   sensor plane (spherical illumination x mask, angular spectrum) —
   one jit trace via AdafruitLCD.get_psf.
3) Save the simulated PSF (plus the extracted mask values) and, when a
   measured PSF is supplied, side-by-side and overlay comparison plots.

Reference: scripts/sim/digicam_psf.py (torch/waveprop loop); here the
placement + propagation is the package's differentiable JAX path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs",
                       "sim_digicam_psf.yaml")


@config_main(_CONFIG)
def digicam_psf(config):
    from lenslesspicam_tpu.data.io import load_psf, save_image
    from lenslesspicam_tpu.hardware.slm import adafruit_full2subpattern
    from lenslesspicam_tpu.hardware.trainable_mask import AdafruitLCD
    from lenslesspicam_tpu.utils.plot import plot_image

    fp = config.files.pattern
    assert fp and os.path.exists(fp), f"Pattern {fp} does not exist."
    out_dir = config.run_dir

    dc = config.digicam
    ap_center = tuple(int(v) for v in dc.ap_center)
    ap_shape = tuple(int(v) for v in dc.ap_shape)

    # load the full-grid pattern and extract the aperture subregion
    pattern = np.load(fp)
    if pattern.ndim == 2:
        pattern = np.stack([pattern] * 3, axis=0)
    pattern_sub = adafruit_full2subpattern(pattern, ap_shape, ap_center)
    print("Controllable region shape:", pattern_sub.shape)
    print("Total number of pixels:", int(np.prod(pattern_sub.shape)))

    slm_vals = np.asarray(pattern_sub, np.float32) / 255.0
    if str(dc.slm) == "adafruit":
        # flatten the color channel along rows (column-major), matching
        # the stored-pattern convention (reference digicam_psf.py:117-119)
        slm_vals = slm_vals.reshape((-1, slm_vals.shape[-1]), order="F")
    if config.save:
        np.save(os.path.join(out_dir, "mask_vals.npy"), slm_vals)

    t0 = time.time()
    downsample = int(dc.downsample) if int(dc.downsample) > 1 else None
    mask = AdafruitLCD(
        initial_vals=slm_vals,
        sensor=str(dc.sensor),
        downsample=downsample,
        scene2mask=float(config.sim.scene2mask),
        mask2sensor=float(config.sim.mask2sensor),
        vertical_shift=(int(dc.vertical_shift) // max(int(dc.downsample), 1)
                        if dc.vertical_shift else 0),
        horizontal_shift=(int(dc.horizontal_shift) // max(int(dc.downsample), 1)
                          if dc.horizontal_shift else 0),
        flipud=bool(config.sim.flipud),
        deadspace=bool(config.sim.deadspace),
    )
    psf_sim = np.asarray(mask.get_psf(mask.params))[0]  # (H, W, 3)
    print(f"\nProcessing time: {time.time() - t0:.2f} seconds")

    if config.save:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        bn = os.path.basename(fp).split(".")[0]
        save_image(psf_sim, os.path.join(out_dir, f"{bn}_SIM_psf.png"))

        fig, ax = plt.subplots(frameon=False)
        plot_image(psf_sim, gamma=float(dc.gamma), ax=ax)
        ax.set_axis_off()
        fig.savefig(os.path.join(out_dir, "sim_psf_plot.png"))
        plt.close(fig)

        psf_fp = config.files.psf
        if psf_fp and os.path.exists(psf_fp):
            psf_meas = np.asarray(load_psf(psf_fp, downsample=int(dc.downsample)))
            fig, ax = plt.subplots(frameon=False)
            plot_image(psf_meas, gamma=float(dc.gamma), ax=ax)
            ax.set_axis_off()
            fig.savefig(os.path.join(out_dir, "meas_psf_plot.png"))
            plt.close(fig)

            fig, ax = plt.subplots()
            ax.imshow(psf_sim / psf_sim.max(), alpha=0.7)
            ax.imshow(np.squeeze(psf_meas) / psf_meas.max(), alpha=0.4)
            fig.savefig(os.path.join(out_dir, "psf_overlay.png"))
            plt.close(fig)

        print(f"\nFiles saved to: {out_dir}")
    return psf_sim


if __name__ == "__main__":
    digicam_psf()
