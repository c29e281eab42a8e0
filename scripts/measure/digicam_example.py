"""DigiCam end-to-end example: set a programmable-mask pattern,
capture (or load) a measurement, and reconstruct with the simulated
(or measured) PSF.

1) Load mask values from ``mask.fp`` or draw a random pattern.
2) PSF: load a measured one (``psf=``) or simulate from the mask via
   the differentiable AdafruitLCD model.
3) Measurement: load from ``capture.fp``, or — when an RPi is
   configured — set the mask over SSH, capture, and fetch the file.
4) Reconstruct with ADMM (one jit solve) and save raw + result.

Reference: scripts/measure/digicam_example.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "psf": None,                 # measured PSF path (else simulate)
    "capture": {
        "fp": None,              # measurement path (else capture via SSH)
        "sensor": "rpi_hq",
        "down": 8,
        "flip": True,
        "exp": 0.8,
    },
    "mask": {
        "fp": None,              # (3*Nh, Nw) stored mask values .npy
        "seed": 0,
        "shape": [18, 26],
        "center": [57, 77],
    },
    "simulation": {
        "scene2mask": 0.3,
        "mask2sensor": 0.002,
        "deadspace": True,
        "gamma": None,
    },
    "rpi": {"username": None, "hostname": None},
    "recon": {"n_iter": 100},
    "output_dir": "outputs",
}


def _fill(config, defaults):
    for k, v in defaults.items():
        if isinstance(v, dict):
            config.setdefault(k, {})
            _fill(config[k], v)
        else:
            config.setdefault(k, v)


@config_main(None)
def digicam(config):
    _fill(config, _DEFAULTS)
    from lenslesspicam_tpu.data.image import gamma_correction
    from lenslesspicam_tpu.data.io import load_image, load_psf, save_image
    from lenslesspicam_tpu.hardware.slm import adafruit_sub2full
    from lenslesspicam_tpu.hardware.trainable_mask import AdafruitLCD
    from lenslesspicam_tpu.recon import admm

    out_dir = config["run_dir"]
    cap = config["capture"]
    sim = config["simulation"]

    # 1) mask values
    if config["mask"]["fp"]:
        mask_vals = np.load(config["mask"]["fp"])
    else:
        rng = np.random.RandomState(int(config["mask"]["seed"]))
        mask_vals = rng.uniform(0, 1, tuple(config["mask"]["shape"]))

    mask = AdafruitLCD(
        initial_vals=mask_vals.astype(np.float32),
        sensor=cap["sensor"],
        downsample=int(cap["down"]),
        flipud=bool(cap["flip"]),
        scene2mask=float(sim["scene2mask"]),
        mask2sensor=float(sim["mask2sensor"]),
        deadspace=bool(sim["deadspace"]),
    )

    # 2) PSF
    if config["psf"]:
        psf = np.asarray(load_psf(config["psf"], downsample=int(cap["down"]),
                                  flip=bool(cap["flip"])), np.float32)
    else:
        psf = np.asarray(mask.get_psf(mask.params), np.float32)
    psf_np = psf[0]
    if sim["gamma"]:
        psf_np = gamma_correction(psf_np / psf_np.max(), gamma=float(sim["gamma"]))
    save_image(psf_np, os.path.join(out_dir, "digicam_psf.png"))
    print(f"PSF shape: {psf.shape}")

    # 3) measurement
    if cap["fp"]:
        img = np.asarray(load_image(cap["fp"], verbose=True))
    else:
        from lenslesspicam_tpu.hardware import remote

        assert config["rpi"]["username"] and config["rpi"]["hostname"], (
            "no capture.fp given and no RPi configured (rpi.username/hostname)")
        pattern = adafruit_sub2full(mask_vals,
                                    center=tuple(config["mask"]["center"]))
        print("Setting mask...")
        remote.set_programmable_mask(
            pattern, "adafruit", rpi_username=config["rpi"]["username"],
            rpi_hostname=config["rpi"]["hostname"])
        print("Capturing...")
        localfile, img = remote.capture(
            rpi_username=config["rpi"]["username"],
            rpi_hostname=config["rpi"]["hostname"],
            exp=float(cap["exp"]), output_path=out_dir)
        print(f"Captured to {localfile}")
        img = np.asarray(img)

    print("image range:", img.min(), img.max())

    # 4) reconstruct
    img = img.astype(np.float32) / img.max()
    if img.ndim == 3:
        img = img[None]          # (D, H, W, C)
    if cap["flip"]:
        img = np.rot90(img, k=2, axes=(-3, -2))
    if img.shape[-3:-1] != psf.shape[-3:-1]:
        from lenslesspicam_tpu.data.image import resize

        img = np.asarray(resize(img, shape=psf.shape[-3:-1] + (img.shape[-1],)))
    print("Reconstructing")
    conv = admm.make_convolver(psf)
    res = np.asarray(admm.run_jit(conv, img[None],
                                  n_iter=int(config["recon"]["n_iter"])))[0]
    res = res / res.max()
    save_image(img[0], os.path.join(out_dir, "digicam_raw.png"))
    save_image(res[0], os.path.join(out_dir, "digicam_recon.png"))
    print("Done")
    return res


if __name__ == "__main__":
    digicam()
