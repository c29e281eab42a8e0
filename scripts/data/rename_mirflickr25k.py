"""Rename MirFlickr25k files to match the larger dataset's convention:
strip the "im" prefix and decrement the index by one (im1.jpg -> 0.jpg).

    python scripts/data/rename_mirflickr25k.py dir_path=<mirflickr dir>

Reference: scripts/data/rename_mirflickr25k.py.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {"dir_path": "data/mirflickr/mirflickr", "output_dir": "outputs"}


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from lenslesspicam_tpu.data.datasets import natural_sort

    dir_path = config["dir_path"]
    assert os.path.isdir(dir_path), f"no directory {dir_path}"
    files = natural_sort(glob.glob(os.path.join(dir_path, "*.jpg")))

    for filename in files:
        bn = os.path.basename(filename)
        file_number = int(bn.replace("im", "").split(".")[0])
        new_filename = os.path.join(dir_path, f"{file_number - 1}.jpg")
        os.rename(filename, new_filename)

    print(f"Number of files: {len(files)}")
    print("Done")
    return len(files)


if __name__ == "__main__":
    main()
