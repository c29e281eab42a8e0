"""3-D data converters: .mat volumes -> .npy / .npz / .tiff stacks
(reference: scripts/data/3d/*)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {"fp": None, "key": None, "format": "npy", "output_dir": "outputs"}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    assert config["fp"], "set fp=<.mat file>"
    from scipy.io import loadmat

    mat = loadmat(config["fp"])
    keys = [k for k in mat if not k.startswith("__")]
    key = config["key"] or keys[0]
    vol = np.asarray(mat[key])
    print(f"loaded {key}: {vol.shape} {vol.dtype}")

    base = os.path.join(config["run_dir"],
                        os.path.splitext(os.path.basename(config["fp"]))[0])
    if config["format"] == "npy":
        np.save(base + ".npy", vol)
    elif config["format"] == "npz":
        np.savez_compressed(base + ".npz", vol)
    elif config["format"] == "tiff":
        import cv2

        for i in range(vol.shape[0]):
            sl = vol[i].astype(np.float32)
            sl = (sl / sl.max() * 65535).astype(np.uint16) if sl.max() > 0 else sl.astype(np.uint16)
            cv2.imwrite(f"{base}_{i:03d}.tiff", sl)
    print(f"saved {base}.{config['format']}")


if __name__ == "__main__":
    main()
