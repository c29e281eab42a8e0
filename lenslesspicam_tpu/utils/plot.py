"""Plotting utilities (reference: lensless/utils/plot.py).

matplotlib helpers for PSFs/reconstructions: 2D/3D-aware image display
with optional gamma, pixel histograms, cross sections, autocorrelations,
and training-curve comparison from metrics.json files
(plot.py:19,121,171,262,303,358).
"""

from __future__ import annotations

import json
import os
import warnings

import matplotlib

if os.environ.get("DISPLAY") is None:
    matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..data.image import autocorr2d, gamma_correction


def plot_image(img, ax=None, gamma=None, normalize=True):
    """2D/3D-aware image plot (plot.py:19-118); depth>1 shows the max
    projection per depth stacked horizontally."""
    img = np.asarray(img)
    if img.ndim == 4:  # (D, H, W, C)
        if img.shape[0] == 1:
            img = img[0]
        else:
            img = np.concatenate(list(img), axis=1)
    if ax is None:
        _, ax = plt.subplots()
    disp = img.astype(np.float32)
    if normalize and disp.max() > 0:
        disp = disp / disp.max()
    if gamma is not None:
        disp = gamma_correction(disp, gamma)
    if disp.shape[-1] == 1:
        ax.imshow(disp[..., 0], cmap="gray")
    else:
        ax.imshow(np.clip(disp, 0, 1))
    ax.set_xticks([])
    ax.set_yticks([])
    return ax


def pixel_histogram(img, ax=None, nbits=None, log_scale=True):
    """Per-channel pixel histogram (plot.py:121-168)."""
    img = np.asarray(img)
    if ax is None:
        _, ax = plt.subplots()
    max_val = 2**nbits - 1 if nbits else (img.max() or 1)
    if img.ndim == 3 and img.shape[-1] == 3:
        for i, color in enumerate("rgb"):
            ax.hist(img[..., i].ravel(), bins=100, range=(0, max_val),
                    color=color, alpha=0.5)
    else:
        ax.hist(img.ravel(), bins=100, range=(0, max_val), color="gray")
    if log_scale:
        ax.set_yscale("log")
    return ax


def plot_cross_section(img, row=None, ax=None, log_scale=True,
                       plot_db_drop=None, min_val=1e-4, max_val=None,
                       plot_width=None, **kwargs):
    """Horizontal cross-section with optional -NdB width estimation
    (plot.py:171-259).

    By default the cross-section goes through the row containing the
    global maximum (a PSF peak).  With ``plot_db_drop`` the symmetric
    -NdB width about the peak is estimated, marked with dashed lines,
    and printed — used by the measure/analyze tools to report PSF and
    autocorrelation widths.  Returns ``(ax, cross_section)``.
    """
    img = np.asarray(img, np.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    if row is None:
        row = int(np.unravel_index(np.argmax(img), img.shape)[0])
    if ax is None:
        _, ax = plt.subplots()
    vals = img[row].astype(np.float32)
    if max_val is None:
        max_val = vals.max() or 1.0
    vals = vals / max_val
    floor = max(min_val, float(vals.min()))
    if log_scale:
        vals = 10 * np.log10(np.maximum(vals, floor))
        floor = 10 * np.log10(floor)
        ax.set_ylabel("dB")
    x_vals = np.arange(len(vals)) - int(np.argmax(vals))
    ax.plot(x_vals, vals, **kwargs)
    if log_scale:
        ax.set_ylim([floor, 0])
    if plot_width is not None:
        half_width = plot_width // 2 + 1
        ax.set_xlim([-half_width, half_width])
    ax.grid()
    ax.set_title("Cross-section")
    if log_scale and plot_db_drop:
        rel = vals - np.max(vals)
        zero_crossings = np.where(np.diff(np.signbit(rel + plot_db_drop)))[0]
        if len(zero_crossings) >= 2:
            zero_crossings -= int(np.argmax(rel))
            first = np.abs(zero_crossings[np.argmin(np.abs(zero_crossings))])
            width = 2 * int(np.abs(first))
            ax.axvline(x=-first, c="k", linestyle="--")
            ax.axvline(x=+first, c="k", linestyle="--")
            print(f"-{plot_db_drop}dB width = {width} pixels")
            ax.set_xlabel(f"-{plot_db_drop}dB width = {width}")
        else:
            warnings.warn(
                f"Width could not be determined; did not detect two "
                f"-{plot_db_drop}dB points: {zero_crossings}")
    return ax, vals


def plot_autocorr2d(vals, ax=None):
    """2-D autocorrelation plot (plot.py:262-300)."""
    vals = np.asarray(vals)
    if vals.ndim == 3:
        vals = vals.mean(axis=-1)
    autocorr = autocorr2d(vals)
    if ax is None:
        _, ax = plt.subplots()
    ax.imshow(autocorr, cmap="gray")
    ax.set_xticks([])
    ax.set_yticks([])
    return ax, autocorr


def plot_autocorr_rgb(img, ax=None):
    """Per-channel autocorrelations (plot.py:303-355)."""
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[-1] == 3
    if ax is None:
        _, ax = plt.subplots(1, 3, figsize=(12, 4))
    for i in range(3):
        _, ac = plot_autocorr2d(img[..., i], ax=ax[i])
        ax[i].set_title("RGB"[i])
    return ax


def compare_models(model_paths, metric="PSNR", ax=None, labels=None):
    """Training-curve comparison from metrics.json files
    (plot.py:358-426)."""
    if ax is None:
        _, ax = plt.subplots()
    for i, path in enumerate(model_paths):
        fp = os.path.join(path, "metrics.json") if os.path.isdir(path) else path
        with open(fp) as f:
            metrics = json.load(f)
        epochs, vals = [], []
        for epoch, entry in sorted(metrics.items(), key=lambda kv: int(kv[0])):
            ev = entry.get("eval", entry)
            if metric in ev:
                epochs.append(int(epoch))
                vals.append(ev[metric])
        label = labels[i] if labels else os.path.basename(os.path.normpath(path))
        ax.plot(epochs, vals, marker="o", label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric)
    ax.legend()
    return ax
