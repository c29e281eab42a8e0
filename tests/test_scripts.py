"""CLI scripts end-to-end on tiny synthetic inputs + config system."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import cv2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, LPT_PLATFORM="cpu", PYTHONPATH=REPO)


def _make_inputs(tmp_path):
    rng = np.random.RandomState(0)
    psf = (rng.rand(64, 96, 3) * 200 + 20).astype(np.uint8)
    data = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    psf_fp = str(tmp_path / "psf.png")
    data_fp = str(tmp_path / "data.png")
    cv2.imwrite(psf_fp, psf)
    cv2.imwrite(data_fp, data)
    return psf_fp, data_fp


def _run(args, cwd):
    return subprocess.run([sys.executable] + args, cwd=cwd, env=ENV,
                          capture_output=True, text=True, timeout=600)


def test_config_system(tmp_path):
    from lenslesspicam_tpu.utils.config import load_config, parse_overrides

    cfg_fp = tmp_path / "c.yaml"
    cfg_fp.write_text("a:\n  b: 1\n  c: [1, 2]\nd: hello\n")
    ov = parse_overrides(["a.b=5", "d=world", "e.f=2.5"])
    cfg = load_config(str(cfg_fp), ov)
    assert cfg.a.b == 5
    assert cfg.a.c == [1, 2]
    assert cfg.d == "world"
    assert cfg.e.f == 2.5


def test_admm_script(tmp_path):
    psf_fp, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/recon/admm.py", f"input.psf={psf_fp}", f"input.data={data_fp}",
         "preprocess.downsample=2", "admm.n_iter=5",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "recon" in res.stdout


def test_gd_script(tmp_path):
    psf_fp, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/recon/gradient_descent.py", f"input.psf={psf_fp}",
         f"input.data={data_fp}", "preprocess.downsample=2",
         "gradient_descent.n_iter=5", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_apgd_script(tmp_path):
    psf_fp, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/recon/apgd.py", f"input.psf={psf_fp}", f"input.data={data_fp}",
         "preprocess.downsample=2", "apgd.n_iter=5", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_benchmark_script(tmp_path):
    res = _run(
        ["scripts/eval/benchmark_recon.py", "n_files=4", "batchsize=2",
         "algorithms=[ADMM,FISTA]", "n_iter_range=[2,5]",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    results = None
    for root, _, files in os.walk(f"{tmp_path}/out"):
        if "results.json" in files:
            with open(os.path.join(root, "results.json")) as f:
                results = json.load(f)
    assert results and "ADMM" in results["results"]


def test_train_script(tmp_path):
    res = _run(
        ["scripts/recon/train_learning_based.py", "dataset.n_files=8",
         "dataset.batch_size=2", "training.epoch=1",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "best" in res.stdout


def test_simulate_script(tmp_path):
    res = _run(
        ["scripts/sim/simulate_dataset.py", "n_files=3",
         f"output_dir={tmp_path}/out", "mask.type=FresnelZoneAperture",
         "mask.downsample=16"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "saved 3 pairs" in res.stdout


def test_sim_single_file_script(tmp_path):
    psf_fp, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/sim/single_file.py", f"files.original={data_fp}",
         f"files.psf={psf_fp}", "simulation.downsample=1",
         "admm.n_iter=5", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PSNR" in res.stdout


def test_sim_mask_single_file_script(tmp_path):
    _, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/sim/mask_single_file.py", f"files.original={data_fp}",
         "mask.type=MLS", "simulation.downsample=16",
         "simulation.flatcam=True", "recon.algo=tikhonov",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PSNR" in res.stdout


def test_sim_mask_dataset_script(tmp_path):
    rng = np.random.RandomState(0)
    ds_dir = tmp_path / "imgs"
    ds_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(ds_dir / f"im{i}.png"),
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    res = _run(
        ["scripts/sim/mask_dataset.py", f"files.dataset={ds_dir}",
         "mask.type=MLS", "simulation.downsample=16",
         "simulation.flatcam=True", "recon.algo=tikhonov",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PSNR (avg)" in res.stdout


def test_sim_digicam_psf_script(tmp_path):
    rng = np.random.RandomState(0)
    pattern_fp = str(tmp_path / "pattern.npy")
    np.save(pattern_fp, (rng.rand(3, 128, 160) * 255).astype(np.uint8))
    res = _run(
        ["scripts/sim/digicam_psf.py", f"files.pattern={pattern_fp}",
         "digicam.downsample=16", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Controllable region shape" in res.stdout


def test_analyze_image_script(tmp_path):
    _, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/measure/analyze_image.py", f"fp={data_fp}",
         "lensless=True", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Autocorrelation saved" in res.stdout


def test_analyze_measured_dataset_script(tmp_path):
    rng = np.random.RandomState(0)
    ds = tmp_path / "meas"
    ds.mkdir()
    for i in range(4):
        val = 60 if i == 3 else 200  # file 3 underexposed
        cv2.imwrite(str(ds / f"im{i}.png"),
                    (rng.rand(24, 24, 3) * val).astype(np.uint8))
    res = _run(
        ["scripts/measure/analyze_measured_dataset.py",
         f"dataset_path={ds}", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "bad files" in res.stdout


def test_digicam_example_script(tmp_path):
    _, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/measure/digicam_example.py", f"capture.fp={data_fp}",
         "capture.down=16", "recon.n_iter=3", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Done" in res.stdout


def test_sim_dataset_script(tmp_path):
    psf_fp, _ = _make_inputs(tmp_path)
    rng = np.random.RandomState(1)
    ds_dir = tmp_path / "imgs"
    ds_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(ds_dir / f"im{i}.png"),
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    res = _run(
        ["scripts/sim/dataset.py", f"files.dataset={ds_dir}",
         f"files.psf={psf_fp}", "simulation.downsample=1",
         "admm.n_iter=3", f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PSNR (avg)" in res.stdout


def test_sim_jax_dataset_script(tmp_path):
    rng = np.random.RandomState(1)
    ds_dir = tmp_path / "imgs"
    ds_dir.mkdir()
    for i in range(5):
        cv2.imwrite(str(ds_dir / f"im{i}.png"),
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    res = _run(
        ["scripts/sim/jax_dataset.py", f"files.dataset={ds_dir}",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Time per batch" in res.stdout


def test_pretrained_helper_flow(tmp_path):
    """scripts/recon/_pretrained helpers end-to-end with the classical
    backend (HF checkpoint download is gated offline)."""
    sys.path.insert(0, os.path.join(REPO, "scripts", "recon"))
    try:
        import _pretrained as P
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(0)
    psf = rng.rand(1, 32, 40, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    meas = rng.rand(1, 1, 32, 40, 3).astype(np.float32)
    recon = P.build_recon("admm", None, psf, n_iter=5)
    res, avg_ms = P.timed_apply(recon, meas, n_trials=2)
    assert np.isfinite(np.asarray(res)).all() and avg_ms > 0
    files = P.save_outputs(
        str(tmp_path), "admm", 0, res, meas, lensed=meas[0, 0],
        alignment={"top_left": (2, 2), "height": 20, "width": 24}, psf=psf)
    for fp in files:
        assert os.path.isfile(fp)
    crop = P.alignment_crop(np.zeros((32, 40, 3)),
                            {"top_left": (2, 2), "height": 20, "width": 24})
    assert crop.shape == (20, 24, 3)


def test_train_script_resume(tmp_path):
    """training.resume=<prior checkpoints dir> restores and continues
    from the stored epoch (start_epoch plumbed through Trainer.train)."""
    res = _run(
        ["scripts/recon/train_learning_based.py", "dataset.n_files=8",
         "dataset.batch_size=2", "training.epoch=1",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    ckpt = None
    for root, dirs, _ in os.walk(f"{tmp_path}/out"):
        if "checkpoints" in dirs:
            ckpt = os.path.join(root, "checkpoints")
    assert ckpt, "no checkpoints dir written"

    res = _run(
        ["scripts/recon/train_learning_based.py", "dataset.n_files=8",
         "dataset.batch_size=2", "training.epoch=2",
         f"training.resume={ckpt}", f"output_dir={tmp_path}/out2"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "resumed at epoch 1" in res.stdout


def test_collect_dataset_dummy_resume(tmp_path):
    """The acquisition loop's hardware-free surface: dummy mode copies
    inputs through, resume skips existing outputs, the seeded mask pool
    is generated and reused (reference
    scripts/measure/collect_dataset_on_device.py recovery behavior)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        cv2.imwrite(str(in_dir / f"img_{i}.png"),
                    (rng.rand(16, 24, 3) * 255).astype(np.uint8))
    out = tmp_path / "out"
    res = _run(
        ["scripts/measure/collect_dataset_on_device.py",
         f"input_dir={in_dir}", "dummy=True", "n_files=3",
         "masks.n=2", "masks.shape=[4,5]", "masks.seed=1",
         f"output_dir={out}"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    measured = os.path.join(out, "measured")
    pngs = [f for f in os.listdir(measured) if f.endswith(".png")]
    assert len(pngs) == 3
    masks = os.listdir(os.path.join(measured, "masks"))
    assert sorted(masks) == ["mask_0.npy", "mask_1.npy"]

    # resume: same stable output dir, existing captures are skipped
    res2 = _run(
        ["scripts/measure/collect_dataset_on_device.py",
         f"input_dir={in_dir}", "dummy=True", "n_files=4",
         "masks.n=2", "masks.shape=[4,5]", "masks.seed=1",
         f"output_dir={out}"],
        cwd=REPO,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert "resuming at index 3" in res2.stdout
    pngs = [f for f in os.listdir(measured) if f.endswith(".png")]
    assert len(pngs) == 4


def test_recon_demo_script(tmp_path):
    """Offline demo reconstruction of a previously-captured file
    (reference scripts/recon/demo.py — the bot's subprocess target)."""
    psf_fp, data_fp = _make_inputs(tmp_path)
    res = _run(
        ["scripts/recon/demo.py", f"raw={data_fp}",
         f"camera.psf={psf_fp}", "recon.downsample=2",
         "recon.admm.n_iter=5", "postproc.crop_hor=[0.1,0.9]",
         f"output_dir={tmp_path}/out"],
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    outs = [os.path.join(d, f) for d, _, fs in os.walk(f"{tmp_path}/out")
            for f in fs if f == "reconstructed.png"]
    assert outs, res.stdout
