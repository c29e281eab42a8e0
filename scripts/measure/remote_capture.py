"""Remote capture from the Raspberry Pi camera
(reference: scripts/measure/remote_capture.py).

    python scripts/measure/remote_capture.py rpi.username=pi \
        rpi.hostname=raspberrypi.local capture.exp=0.1
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "capture": {"exp": 0.02, "iso": 100, "bayer": True, "nbits_out": 12},
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"], "set rpi.username and rpi.hostname"
    fp, _ = remote.capture(
        config["rpi"]["username"], config["rpi"]["hostname"],
        output_path=config["run_dir"], **config["capture"],
    )
    print(f"captured {fp}")

    if config["capture"]["bayer"]:
        from lenslesspicam_tpu.data.io import load_image, save_image

        rgb = load_image(fp, bayer=False)
        save_image(rgb, fp.replace(".dng", "_rgb.png"))


if __name__ == "__main__":
    main()
