"""Check a measured dataset for saturation / underexposure.

For every image: record the max pixel value, flag files whose max is
below ``desired_range[0]`` (underexposed) or whose fraction of pixels
at/above ``desired_range[1]`` exceeds ``saturation_percent``
(saturated).  Saves a histogram of per-file maxima, optionally deletes
the flagged files (``delete_bad=True`` — non-interactive flag instead
of the reference's stdin prompt), and cross-checks that every
measurement has a matching ``black_background<name>.png`` when
background files are present.

Reference: scripts/measure/analyze_measured_dataset.py.
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_DEFAULTS = {
    "dataset_path": None,
    "ext": "png",
    "desired_range": [150, 255],
    "saturation_percent": 0.05,   # fraction of pixels at/above range max
    "delete_bad": False,
    "start_idx": None,
    "n_files": None,
    "output_dir": "outputs",
}


def natural_sort(arr):
    def key(s):
        return [int(c) if c.isdigit() else c.lower()
                for c in re.split(r"([0-9]+)", s)]

    return sorted(arr, key=key)


@config_main(None)
def main(config):
    for k, v in _DEFAULTS.items():
        config.setdefault(k, v)
    from PIL import Image

    folder = config["dataset_path"] or config.get("folder")
    assert folder, "set dataset_path=<folder>"
    lo, hi = (float(v) for v in config["desired_range"])

    files = natural_sort(glob.glob(os.path.join(folder, f"*.{config['ext']}")))
    files_bg = natural_sort(
        glob.glob(os.path.join(folder, "black_background*.png")))
    files = [fn for fn in files if fn not in files_bg]
    print(f"Found {len(files)} files")
    if config["start_idx"]:
        files = files[int(config["start_idx"]):]
        print(f"Starting at file {files[0]}")
    if config["n_files"]:
        files = files[: int(config["n_files"])]
        print(f"Analyzing first {len(files)} files")
    assert files, "no files to analyze"

    max_vals, bad_files = [], []
    t0 = time.time()
    for fn in files:
        im = np.array(Image.open(fn))
        max_val = im.max()
        max_vals.append(max_val)
        saturation_ratio = float(np.sum(im >= hi) / im.size)
        if max_val < lo:
            bad_files.append(fn)
            print(f"File {fn} has max value {max_val} (underexposed)")
        elif saturation_ratio > float(config["saturation_percent"]):
            bad_files.append(fn)
            print(f"File {fn} has saturation ratio {saturation_ratio:.4f}")

    print(f"Went through {len(files)} files in {time.time() - t0:.2f} seconds")
    print(f"Found {len(bad_files)} / {len(files)} bad files "
          f"({100 * len(bad_files) / len(files):.1f}%)")

    # histogram of per-file maxima
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_fp = os.path.join(config["run_dir"], "max_vals.png")
    plt.hist(max_vals, bins=100)
    plt.savefig(output_fp)
    print(f"Saved histogram to {output_fp}")

    if config["delete_bad"]:
        for fn in bad_files:
            os.remove(fn)
            print(f"REMOVED file {fn}")

    # background-file matching
    if files_bg:
        print(f"Found {len(files_bg)} background files")
        files_no_bg = []
        for fn in files:
            bn = os.path.basename(fn).split(".")[0]
            bg_file = os.path.join(folder, f"black_background{bn}.png")
            if bg_file not in files_bg:
                files_no_bg.append(fn)
        print(f"Found {len(files_no_bg)} files without background")
        if config["delete_bad"]:
            for fn in files_no_bg:
                if os.path.exists(fn):
                    os.remove(fn)
                    print(f"REMOVED file {fn} (no background)")
    return len(bad_files)


if __name__ == "__main__":
    main()
