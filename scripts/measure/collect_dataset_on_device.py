"""Dataset acquisition loop: display each image, (re)program the mask,
capture (reference: scripts/measure/collect_dataset_on_device.py).

Runs on a host with SSH access to the Raspberry Pi.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "input_dir": None,           # folder of images to display
    "masks": None,               # optional .npy with mask patterns (N, H, W)
    "capture": {"exp": 0.02, "bayer": True},
    "runtime_hours": None,
    "start_idx": 0,
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"] and config["input_dir"]
    files = sorted(glob.glob(os.path.join(config["input_dir"], "*")))
    masks = np.load(config["masks"]) if config["masks"] else None
    deadline = (time.time() + 3600 * config["runtime_hours"]
                if config["runtime_hours"] else None)

    for i, fp in enumerate(files[config["start_idx"]:], config["start_idx"]):
        if deadline and time.time() > deadline:
            print("runtime budget exhausted")
            break
        if masks is not None:
            remote.set_programmable_mask(
                masks[i % len(masks)],
                rpi_username=config["rpi"]["username"],
                rpi_hostname=config["rpi"]["hostname"],
            )
        remote.display(fp, config["rpi"]["username"], config["rpi"]["hostname"])
        out = remote.capture(
            config["rpi"]["username"], config["rpi"]["hostname"],
            fn=f"capture_{i:06d}", localdir=config["run_dir"],
            **config["capture"],
        )
        print(f"[{i}/{len(files)}] {out}")


if __name__ == "__main__":
    main()
