"""Learned-reconstruction training CLI
(reference: scripts/recon/train_learning_based.py).

    python scripts/recon/train_learning_based.py \
        reconstruction.method=unrolled_admm \
        reconstruction.post_process.network=UnetRes training.epoch=5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from lenslesspicam_tpu.utils.config import config_main

_CONFIG = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "train.yaml")


def _build_model(config):
    from lenslesspicam_tpu.models.inversion import SVDeconvNet, TrainableInversion
    from lenslesspicam_tpu.models.multi_wiener import MultiWiener
    from lenslesspicam_tpu.models.trainable_recon import TrainableRecon
    from lenslesspicam_tpu.models.unet import UNetRes
    from lenslesspicam_tpu.models.unrolled import UnrolledADMM, UnrolledFISTA

    rc = config.reconstruction
    method = rc.method

    def proc(sub):
        if sub.get("network") in ("UnetRes", "DruNet"):
            return UNetRes(out_nc=3, nc=tuple(sub["nc"]), nb=sub.get("depth", 4))
        return None

    if method == "multi_wiener":
        return MultiWiener(in_channels=3, out_channels=3)

    inversion = {
        "unrolled_admm": lambda: UnrolledADMM(
            n_iter=rc.unrolled_admm.n_iter,
            mu1=float(rc.unrolled_admm.mu1), mu2=float(rc.unrolled_admm.mu2),
            mu3=float(rc.unrolled_admm.mu3), tau=float(rc.unrolled_admm.tau),
            remat=True,
        ),
        "unrolled_fista": lambda: UnrolledFISTA(n_iter=rc.unrolled_admm.n_iter),
        "trainable_inversion": lambda: TrainableInversion(),
        "sv_deconvnet": lambda: SVDeconvNet(),
    }[method]()

    return TrainableRecon(
        camera_inversion=inversion,
        pre_process=proc(rc.pre_process),
        post_process=proc(rc.post_process),
        psf_network=UNetRes(out_nc=3, nc=(4, 8, 16, 32), nb=2) if rc.psf_network else None,
    )


@config_main(_CONFIG)
def main(config):
    from lenslesspicam_tpu.data.datasets import get_dataset, simulate_dataset
    from lenslesspicam_tpu.hardware.trainable_mask import prep_trainable_mask
    from lenslesspicam_tpu.train.trainer import Trainer, TrainerConfig

    # dataset
    if config.dataset.name == "simulated":
        rng = np.random.RandomState(config.seed)
        psf = rng.rand(1, 64, 96, 3).astype(np.float32)
        psf /= np.linalg.norm(psf)
        ds = simulate_dataset({"dataset": "random",
                               "n_files": config.dataset.n_files}, psf=psf)
    else:
        ds = get_dataset(config.dataset.name, split="train",
                         downsample=config.dataset.downsample)
        psf = ds.psf

    batches = list(ds.batches(batch_size=config.dataset.batch_size))
    n_test = max(len(batches) // 5, 1)
    train_batches, test_batches = batches[n_test:], batches[:n_test]

    mask = prep_trainable_mask(dict(config.trainable_mask or {}), psf=psf)
    model = _build_model(config)

    tcfg = TrainerConfig(
        epochs=config.training.epoch,
        lr=float(config.training.lr),
        optimizer=config.training.optimizer,
        loss=config.training.loss,
        lpips_weight=config.training.lpips,
        crop=config.training.crop,
        skip_nan=config.training.skip_nan,
        clip_grad=config.training.clip_grad,
        metric_for_best=config.training.metric_for_best,
        cosine_decay_warmup=config.training.get("cosine_decay_warmup", False),
        save_dir=os.path.join(config.run_dir, "checkpoints"),
    )
    trainer = Trainer(model, psf, lambda: iter(train_batches), test_batches,
                      tcfg, mask=mask, seed=config.seed)
    log = trainer.train()
    print(f"best {tcfg.metric_for_best}: {trainer.best_metric}")
    return log


if __name__ == "__main__":
    main()
