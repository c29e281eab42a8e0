"""Display an image on the remote screen (reference:
scripts/measure/remote_display.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "rpi": {"username": None, "hostname": None},
    "fp": None,
    "display": {"brightness": 100, "rot90": 0, "pad": 0, "vshift": 0, "hshift": 0},
    "output_dir": "outputs",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"] and config["fp"]
    remote.display(config["fp"], config["rpi"]["username"],
                   config["rpi"]["hostname"], **config["display"])
    print("displayed", config["fp"])


if __name__ == "__main__":
    main()
