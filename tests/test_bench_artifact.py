"""bench.py artifact plumbing: timing variance fields, backend-identity
markers, and the degraded-rung flag (VERDICT r4 #5/#6).  Pure-CPU unit
tests of the harness itself — the full rungs run on the chip."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

import bench


def test_timed_median_and_spread_fields():
    calls = []

    def fake(k):
        calls.append(k)
        time.sleep(0.002 * k)

    val = bench._timed(fake, base_iter=1, n_iter=11, repeats=3)
    # ~= (11-1)/(0.02-0.002) it/s
    assert 300 < val < 800, val
    assert bench._LAST_TIMING["n_meas"] == 3
    assert bench._LAST_TIMING["median"] == round(val, 3)
    assert bench._LAST_TIMING["iqr"] >= 0
    # warmup + 3 x (full, base) pairs
    assert calls == [1, 11, 1, 11, 1, 11, 1]


def test_timed_rejects_non_scaling_clock():
    # base deterministically SLOWER than full — the difference method
    # must refuse to report a rate from a non-scaling clock
    def inverted(k):
        time.sleep(0.005 if k == 1 else 0.001)

    with pytest.raises(AssertionError):
        bench._timed(inverted, base_iter=1, n_iter=5, repeats=1)


def test_config_fields_marks_degraded(monkeypatch):
    monkeypatch.setenv("LPT_SPLIT_IO", "bf16")
    monkeypatch.setenv("LPT_CARRY_TV", "i16")
    monkeypatch.setenv("LPT_CARRY_V", "i16")
    monkeypatch.setenv("LPT_PALLAS_PRECISION", "default")
    good = bench._config_fields("rfused", certified=True)
    assert good["degraded"] is False and good["certified"] is True
    assert good["backend"] == "rfused"
    assert "io=bf16" in good["config"] and "v=i16" in good["config"]

    # any fallback is loudly marked
    assert bench._config_fields("fused", certified=True)["degraded"]
    assert bench._config_fields("rfused", certified=False)["degraded"]
    monkeypatch.setenv("LPT_SPLIT_IO", "f32")
    assert bench._config_fields("rfused", certified=True)["degraded"]


def test_mode_line_schema_smoke():
    """--mode rung JSON line carries the marker + variance fields
    (tiny grid, CPU interpret; rgb only — one subprocess)."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "bench.run_mode('rgb', shape=(96, 128))\n"
    )
    env = dict(os.environ, LPT_PLATFORM="cpu", BENCH_MODE_NITER="12")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout
    rec = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline", "backend",
                "config", "certified", "degraded", "median", "iqr",
                "n_meas"):
        assert key in rec, f"missing {key}: {rec}"
    assert rec["certified"] is True
    assert np.isfinite(rec["value"])
