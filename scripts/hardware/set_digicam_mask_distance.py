"""Set the DigiCam mask-sensor distance via the stepper motors
(reference: scripts/hardware/set_digicam_mask_distance.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {"rpi": {"username": None, "hostname": None}, "distance_mm": 4.0,
             "output_dir": "outputs"}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from lenslesspicam_tpu.hardware import remote

    assert config["rpi"]["username"], "set rpi.username / rpi.hostname"
    remote.set_mask_sensor_distance(float(config["distance_mm"]),
                                    config["rpi"]["username"],
                                    config["rpi"]["hostname"])
    print(f"mask-sensor distance set to {config['distance_mm']} mm")


if __name__ == "__main__":
    main()
