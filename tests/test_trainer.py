"""Trainer: end-to-end training on a synthetic problem, schedules,
aux losses, checkpointing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lenslesspicam_tpu.models.trainable_recon import TrainableRecon
from lenslesspicam_tpu.models.unrolled import UnrolledADMM
from lenslesspicam_tpu.models.unet import UNetRes
from lenslesspicam_tpu.train.trainer import Trainer, TrainerConfig, make_lr_schedule


def _setup(n_batches=3, batch=2, shape=(1, 24, 32, 3), seed=0):
    rng = np.random.RandomState(seed)
    psf = rng.rand(*shape).astype(np.float32)
    psf /= np.linalg.norm(psf)

    # simulate measurements through the forward model so training has signal
    from lenslesspicam_tpu.ops.fft_conv import FFTConvolver

    conv = FFTConvolver.from_psf(psf, pad=True, norm="backward")
    batches = []
    for _ in range(n_batches):
        lensed = rng.rand(batch, *shape).astype(np.float32)
        lensless = np.asarray(conv.convolve(jnp.asarray(lensed)))
        batches.append({"lensless": lensless.astype(np.float32), "lensed": lensed})
    return psf, batches


def test_trainer_loss_decreases(tmp_path):
    psf, batches = _setup()
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=3))
    cfg = TrainerConfig(epochs=3, lr=1e-2, optimizer="Adam",
                        save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    log = trainer.train(verbose=False)
    losses = [log[e]["loss"] for e in range(1, 4)]
    # the observable contract of training (reference recon/utils.py:1356):
    # loss must actually DECREASE over epochs, not merely avoid exploding
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert all(np.isfinite(v) for v in losses)
    assert (tmp_path / "ckpt" / "metrics.json").exists()
    assert (tmp_path / "ckpt" / "recon_epochBEST").exists()


def test_trainer_aux_losses():
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=2),
        pre_process=UNetRes(out_nc=3, nc=(4, 8, 16, 16), nb=1),
        post_process=UNetRes(out_nc=3, nc=(4, 8, 16, 16), nb=1),
        return_intermediate=True,
    )
    cfg = TrainerConfig(epochs=1, lr=1e-3, unrolled_output_factor=1.0, pre_proc_aux=0.5)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)


def test_trainer_adamw_skip_nan():
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=1, optimizer="AdamW", skip_nan=True, lr=1e-3)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)


@pytest.mark.parametrize("kwargs,checks", [
    (dict(slow_start=0.1), [(0, 0.1), (1, 0.1**0.5), (5, 1.0)]),
    (dict(final_lr=1e-5, lr=1e-3, epochs=11), [(0, 1.0), (10, 0.01)]),
    (dict(exp_decay=0.9), [(0, 1.0), (2, 0.81)]),
    (dict(step=2, gamma=0.1), [(0, 1.0), (2, 0.1), (4, 0.01)]),
])
def test_lr_schedules(kwargs, checks):
    lr = kwargs.pop("lr", 1e-3)
    epochs = kwargs.pop("epochs", 10)
    cfg = TrainerConfig(lr=lr, epochs=epochs, **kwargs)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    for epoch, mult in checks:
        np.testing.assert_allclose(float(sched(epoch)), lr * mult, rtol=1e-5)


def test_cosine_warmup_schedule():
    cfg = TrainerConfig(lr=1e-3, epochs=100, cosine_decay_warmup=True)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    vals = [float(sched(e)) for e in (0, 5, 50, 99)]
    assert vals[0] < vals[1]  # warmup rising
    assert vals[1] > vals[2] > vals[3]  # cosine decay

def test_trainer_processor_schedule_and_freeze():
    """pre_process_delay keeps pre_block out of the forward until its
    epoch; freeze stops a block's params from moving (utils.py:1375-1400)."""
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(
        camera_inversion=UnrolledADMM(n_iter=2),
        pre_process=UNetRes(out_nc=3, nc=(4, 8, 16, 16), nb=1),
        post_process=UNetRes(out_nc=3, nc=(4, 8, 16, 16), nb=1),
    )
    cfg = TrainerConfig(epochs=3, lr=1e-2, pre_process_delay=1,
                        post_process_freeze=1)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    assert trainer._skip_pre and not trainer._skip_post

    pre0 = jax.tree_util.tree_map(np.asarray,
                                  trainer.variables["params"]["pre_block"])
    trainer.train_epoch()  # epoch 0 equivalent: pre skipped -> no grads
    pre1 = jax.tree_util.tree_map(np.asarray,
                                  trainer.variables["params"]["pre_block"])
    for a, b in zip(jax.tree_util.tree_leaves(pre0),
                    jax.tree_util.tree_leaves(pre1)):
        np.testing.assert_array_equal(a, b)

    log = trainer.train(verbose=False)
    assert not trainer._skip_pre           # delay elapsed
    assert "post_block" in trainer._frozen
    post_after = trainer.variables["params"]["post_block"]
    # train once more with post frozen: post params must not move
    snap = jax.tree_util.tree_map(np.asarray, post_after)
    trainer.train_epoch()
    for a, b in zip(jax.tree_util.tree_leaves(snap),
                    jax.tree_util.tree_leaves(
                        trainer.variables["params"]["post_block"])):
        np.testing.assert_array_equal(a, b)
    assert all(np.isfinite(log[e]["loss"]) for e in (1, 2, 3))


def test_trainer_random_rotate_runs():
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=1, lr=1e-3, random_rotate=10.0)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    assert np.isfinite(trainer.train_epoch())


def test_trainer_restore_resume(tmp_path):
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=2, lr=1e-2, save_dir=str(tmp_path / "ck"))
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    trainer.train(verbose=False)
    trained = jax.tree_util.tree_map(np.asarray, trainer.variables["params"])

    fresh = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    epoch = fresh.resume()
    assert epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(fresh.variables["params"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert fresh.metrics_log  # metrics history restored


def test_trainer_eval_forwards_per_batch_psfs():
    """evaluate() must use per-sample PSFs when batches carry them
    (round-1 review: the global PSF was always used) — metrics change
    when the batch PSFs differ from the trainer's global PSF, and are
    identical when they match it."""
    rng = np.random.RandomState(3)
    shape = (1, 24, 32, 3)
    psf_a = rng.rand(*shape).astype(np.float32); psf_a /= np.linalg.norm(psf_a)
    psf_b = rng.rand(*shape).astype(np.float32); psf_b /= np.linalg.norm(psf_b)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=4))
    lensed = rng.rand(2, *shape).astype(np.float32)
    lensless = rng.rand(2, *shape).astype(np.float32)
    cfg = TrainerConfig(epochs=1)

    base = [{"lensless": lensless, "lensed": lensed}]
    trainer = Trainer(model, psf_a, lambda: iter(base), base, cfg)
    global_only = trainer.evaluate()

    trainer.test_batches = [{"lensless": lensless, "lensed": lensed,
                             "psfs": np.stack([psf_b, psf_b])}]
    with_other = trainer.evaluate()
    assert with_other["MSE"] != global_only["MSE"]

    trainer.test_batches = [{"lensless": lensless, "lensed": lensed,
                             "psfs": np.stack([psf_a, psf_a])}]
    with_same = trainer.evaluate()
    np.testing.assert_allclose(with_same["MSE"], global_only["MSE"], rtol=1e-5)


def test_trainer_extra_eval_sets():
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=1)
    psf_b, batches_b = _setup(n_batches=1, seed=9)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg,
                      extra_eval_sets={"setB": {"batches": batches_b,
                                                "psf": psf_b}})
    metrics = trainer.evaluate()
    assert "PSNR" in metrics and "setB_PSNR" in metrics


def test_trainer_composite_best_metric():
    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=1, metric_for_best=None)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    trainer.train(verbose=False)
    assert trainer.best_metric is not None and np.isfinite(trainer.best_metric)


def test_trainer_step_log_and_examples(tmp_path):
    """Local observability: per-step JSONL scalar log + per-epoch example
    reconstruction PNGs (the reference's wandb stream, utils.py:1248-1354)."""
    import json
    import os

    psf, batches = _setup()
    model = TrainableRecon(UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=2, lr=1e-3, save_dir=str(tmp_path / "run"),
                        save_examples=True)
    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg)
    trainer.train(verbose=False)

    log_fp = tmp_path / "run" / "train_log.jsonl"
    assert log_fp.exists()
    recs = [json.loads(ln) for ln in log_fp.read_text().splitlines()]
    assert len(recs) == 2 * len(batches)  # epochs * batches
    assert recs[0]["step"] == 1 and recs[-1]["epoch"] == 2
    assert all(np.isfinite(r["loss"]) for r in recs)
    assert os.path.exists(tmp_path / "run" / "epoch2" / "recon_0.png")
    assert os.path.exists(tmp_path / "run" / "epoch2" / "lensed_0.png")


def test_trainer_logger_hooks(tmp_path):
    """Logger protocol (reference wandb stream, utils.py:729-733): every
    registered (data, step) callable receives per-step losses and
    per-epoch eval metrics; CSVLogger materializes them; a raising
    logger must not break training."""
    from lenslesspicam_tpu.train.loggers import CSVLogger

    psf, batches = _setup(n_batches=2)
    model = TrainableRecon(camera_inversion=UnrolledADMM(n_iter=2))
    cfg = TrainerConfig(epochs=2, lr=1e-3)
    seen = []
    csv = CSVLogger(str(tmp_path / "log.csv"))

    def bad_logger(data, step):
        raise RuntimeError("boom")

    trainer = Trainer(model, psf, lambda: iter(batches), batches[:1], cfg,
                      loggers=[lambda d, s: seen.append((s, d)), csv,
                               bad_logger])
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        trainer.train(verbose=False)

    step_records = [d for _, d in seen if "train/loss_step" in d]
    epoch_records = [d for _, d in seen if "train/loss" in d]
    assert len(step_records) == 2 * 2          # epochs * batches
    assert len(epoch_records) == 2
    assert any("eval/PSNR" in d for _, d in seen)
    # epoch-0 eval logged before training starts
    assert seen[0][0] == 0 and "eval/PSNR" in seen[0][1]

    text = (tmp_path / "log.csv").read_text().splitlines()
    assert text[0].startswith("step")
    assert "train/loss_step" in text[0] and "eval/PSNR" in text[0]
    assert len(text) == 1 + len(seen)


def test_measure_gradient():
    from lenslesspicam_tpu.train.trainer import gradient_norms, measure_gradient

    grads = {"pre": {"w": jnp.full((2, 2), 3.0)}, "post": {"w": jnp.full((4,), 4.0)}}
    total = measure_gradient(grads)
    np.testing.assert_allclose(total, np.sqrt(4 * 9 + 4 * 16), rtol=1e-6)
    per = gradient_norms(grads)
    np.testing.assert_allclose(per["pre"], 6.0, rtol=1e-6)
    np.testing.assert_allclose(per["post"], 8.0, rtol=1e-6)
