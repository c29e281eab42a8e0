"""End-to-end demo: display -> (program mask) -> capture -> reconstruct
(reference: scripts/demo.py).  The hardware legs run over SSH to a
Raspberry Pi (gated on paramiko); reconstruction runs locally.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "fp": "data/original/tree.png",
    "psf": None,
    "mask_pattern": None,
    "capture": {"exp": 0.02, "bayer": True},
    "recon": {"algo": "admm", "n_iter": 100, "downsample": 4},
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)

    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"], "set rpi.username and rpi.hostname"

    # 1. display the file on the screen
    remote.display(config["fp"], config["rpi"]["username"], config["rpi"]["hostname"])

    # 2. optionally program the mask (DigiCam)
    if config["mask_pattern"] is not None:
        pattern = np.load(config["mask_pattern"])
        remote.set_programmable_mask(
            pattern, rpi_username=config["rpi"]["username"],
            rpi_hostname=config["rpi"]["hostname"],
        )

    # 3. capture
    raw_fp, _ = remote.capture(
        config["rpi"]["username"], config["rpi"]["hostname"],
        output_path=config["run_dir"], **config["capture"],
    )

    # 4. reconstruct
    from lenslesspicam_tpu import ADMM, FISTA
    from lenslesspicam_tpu.data.io import load_data, save_image

    psf, data = load_data(config["psf"], raw_fp,
                          downsample=config["recon"]["downsample"],
                          bayer=config["capture"]["bayer"])
    algo = ADMM(psf) if config["recon"]["algo"] == "admm" else FISTA(psf)
    algo.set_data(data)
    res = np.asarray(algo.apply(n_iter=config["recon"]["n_iter"]))
    out_fp = os.path.join(config["run_dir"], "reconstruction.png")
    save_image(res[0], out_fp)
    print(f"saved {out_fp}")


if __name__ == "__main__":
    main()
