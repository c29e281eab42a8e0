"""Measure PSFs for a set of DigiCam mask patterns: program each mask,
capture a point-source response (reference:
scripts/hardware/digicam_measure_psfs.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "masks": None,            # .npy of patterns (N, 3, H, W)
    "capture": {"exp": 0.5, "bayer": True},
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"] and config["masks"]
    masks = np.load(config["masks"])
    for i, pattern in enumerate(masks):
        remote.set_programmable_mask(pattern,
                                     rpi_username=config["rpi"]["username"],
                                     rpi_hostname=config["rpi"]["hostname"])
        fp, _ = remote.capture(config["rpi"]["username"],
                               config["rpi"]["hostname"],
                               fn=f"psf_{i:04d}",
                               output_path=config["run_dir"],
                               **config["capture"])
        print(f"[{i}] {fp}")


if __name__ == "__main__":
    main()
