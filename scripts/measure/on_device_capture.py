"""Camera capture — runs ON the Raspberry Pi
(reference: scripts/measure/on_device_capture.py).

Uses picamera2 (or legacy picamerax) to capture Bayer or RGB data at a
given exposure/ISO and save to disk; invoked remotely by
hardware/remote.capture.  Gated: the camera stack only exists on the Pi.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "fn": "capture",
    "exp": 0.02,
    "iso": 100,
    "bayer": True,
    "nbits_out": 12,
    "down": None,
    "awb_gains": [1.6, 1.2],
    "output_dir": ".",
}


@config_main(None)
def main(config):
    for key, val in _DEFAULTS.items():
        config.setdefault(key, val)
    try:
        from picamera2 import Picamera2
    except ImportError as e:
        raise ImportError("on_device_capture runs on the Raspberry Pi "
                          "(requires picamera2)") from e

    import numpy as np

    cam = Picamera2()
    cfg = cam.create_still_configuration(raw={} if config["bayer"] else None)
    cam.configure(cfg)
    cam.set_controls({
        "ExposureTime": int(config["exp"] * 1e6),
        "AnalogueGain": config["iso"] / 100.0,
    })
    cam.start()
    time.sleep(max(config["exp"] * 2, 0.5))

    if config["bayer"]:
        raw = cam.capture_array("raw")
        out = f"{config['fn']}.dng"
        np.save(out.replace(".dng", ".npy"), raw)
        cam.capture_file(out, name="raw")
    else:
        out = f"{config['fn']}.png"
        cam.capture_file(out)
    cam.stop()
    print(f"captured {out}")


if __name__ == "__main__":
    main()
