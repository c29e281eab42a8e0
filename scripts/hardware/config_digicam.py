"""Program the DigiCam SLM with a (random or saved) pattern
(reference: scripts/hardware/config_digicam.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "pattern": None,          # .npy file; random if not given
    "shape": [26, 40],
    "seed": 0,
    "save": True,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    if config["pattern"]:
        pattern = np.load(config["pattern"])
    else:
        rng = np.random.RandomState(config["seed"])
        pattern = (rng.rand(3, *config["shape"]) * 255).astype(np.uint8)
    if config["save"]:
        fp = os.path.join(config["run_dir"], "pattern.npy")
        np.save(fp, pattern)
        print(f"saved {fp}")
    if config["rpi"]["username"]:
        from lenslesspicam_tpu.hardware import remote

        remote.set_programmable_mask(pattern,
                                     rpi_username=config["rpi"]["username"],
                                     rpi_hostname=config["rpi"]["hostname"])
        print("mask programmed")


if __name__ == "__main__":
    main()
