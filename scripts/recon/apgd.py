"""APGD reconstruction CLI (reference: scripts/recon/apgd_pycsou.py,
using the native accelerated proximal gradient solver)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "recon.yaml")


@config_main(_CONFIG)
def main(config):
    from lenslesspicam_tpu.data.io import load_data, save_image
    from lenslesspicam_tpu.recon import apgd

    assert config.input.psf and config.input.data
    psf, data = load_data(config.input.psf, config.input.data,
                          downsample=config.preprocess.downsample)
    conv = apgd.make_convolver(psf)
    t0 = time.time()
    res = np.asarray(apgd.run(
        conv, data, n_iter=config.apgd.n_iter,
        prox_penalty=config.apgd.prox_penalty,
        diff_penalty=config.apgd.diff_penalty,
    ))
    print(f"apgd recon: {time.time() - t0:.3f} s")
    if config.save:
        save_image(res[0, 0], os.path.join(config.run_dir, "reconstruction.png"))
    return res


if __name__ == "__main__":
    main()
