"""Round-over-round quality non-regression.

Recomputes a fast subset of the committed iteration-sweep baseline
(benchmarks/quality_baseline.json, produced by
scripts/eval/quality_baseline.py — the offline analog of the
reference's scripts/eval/benchmark_recon.py sweep) and asserts the
solvers still reach the recorded PSNR/SSIM.  A solver regression that
changes reconstruction quality shows up here before any TPU run."""

import json
import os

import numpy as np
import pytest

BASELINE = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "quality_baseline.json")


@pytest.fixture(scope="module")
def baseline():
    with open(BASELINE) as f:
        return json.load(f)["results"]


@pytest.mark.parametrize("algo,n", [("admm", 5), ("admm", 100),
                                    ("admm_rfused", 100), ("fista", 100)])
def test_quality_non_regression(baseline, algo, n):
    from scripts.eval.quality_baseline import (
        make_psf, make_scenes, metrics_of, reconstruct, simulate)

    scene = make_scenes()["rects"]
    psf = make_psf()
    meas = simulate(scene, psf)
    est = reconstruct(algo, psf, meas, n)
    m = metrics_of(scene, est)
    ref = baseline["rects"][algo][str(n)]
    assert m["psnr"] >= ref["psnr"] - 0.1, (
        f"{algo} n={n}: PSNR regressed {ref['psnr']:.2f} -> {m['psnr']:.2f}")
    assert m["ssim"] >= ref["ssim"] - 0.005, (
        f"{algo} n={n}: SSIM regressed {ref['ssim']:.4f} -> {m['ssim']:.4f}")


def test_baseline_covers_protocol(baseline):
    """The committed file holds the full benchmark-protocol sweep for
    every solver family (reference protocol
    configs/benchmark/defaults.yaml:34)."""
    for scene in ("rects", "blobs", "grid"):
        for algo in ("admm", "fista", "gd", "nesterov", "admm_split",
                     "admm_rfused"):
            got = set(baseline[scene][algo])
            assert {"5", "10", "20", "50", "100", "200", "300"} <= got
