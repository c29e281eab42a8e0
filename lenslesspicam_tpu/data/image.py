"""Image processing utilities (reference: lensless/utils/image.py).

Host-side numpy/cv2 implementations for the data-loading path (these run
once per file, not in the hot loop), with array-agnostic math where the
simulators reuse them.  Parity notes per function reference the source.
"""

from __future__ import annotations

import cv2
import numpy as np

SUPPORTED_BIT_DEPTH = np.array([8, 10, 12, 16])
FLOAT_DTYPES = (np.float32, np.float64)


def resize(img: np.ndarray, factor=None, shape=None, interpolation=cv2.INTER_CUBIC):
    """Resize (D, H, W, C) by factor or to shape, clipping to the input
    range (image.py:28-78, numpy path: per-depth cv2.resize)."""
    min_val, max_val = img.min(), img.max()
    img_shape = np.array(img.shape)[-3:-1]
    assert factor is not None or shape is not None
    new_shape = tuple(img_shape * factor) if shape is None else tuple(shape[-3:-1])
    new_shape = [int(i) for i in new_shape]
    if np.array_equal(img_shape, new_shape):
        return img
    resized = np.array(
        [
            cv2.resize(img[i], dsize=tuple(new_shape[::-1]), interpolation=interpolation)
            for i in range(img.shape[-4])
        ]
    )
    if resized.ndim == 3:
        resized = np.expand_dims(resized, axis=-1)
    return np.clip(resized, min_val, max_val)


def shift_with_pad(img, shift, pad_mode="constant", axis=(0, 1)):
    """Integer shift via pad+slice (image.py:104-138)."""
    n_dim = img.ndim
    pad_width = [(0, 0)] * n_dim
    slice_obj = [slice(None)] * n_dim
    for i, s in zip(axis, shift):
        if s < 0:
            pad_width[i] = (0, -s)
            slice_obj[i] = slice(-s, None)
        elif s > 0:
            pad_width[i] = (s, 0)
            slice_obj[i] = slice(None, -s)
    shifted = np.pad(img, pad_width=tuple(pad_width), mode=pad_mode)
    return shifted[tuple(slice_obj)]


def rotate_HWC(img: np.ndarray, angle: float) -> np.ndarray:
    """Rotate (..., H, W, C) about the center without expanding
    (image.py:81-101; torchvision rotate analog via cv2 warp)."""
    h, w = img.shape[-3], img.shape[-2]
    mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    flat = img.reshape(-1, h, w, img.shape[-1])
    out = np.stack(
        [cv2.warpAffine(f, mat, (w, h), flags=cv2.INTER_LINEAR).reshape(h, w, -1)
         for f in flat]
    )
    return out.reshape(img.shape)


def rgb2gray(rgb, weights=None, keepchanneldim=True):
    """Weighted channel sum (image.py:158-222); default ITU-R 601-2
    luma transform weights."""
    if weights is None:
        weights = np.array([0.299, 0.587, 0.114])
    weights = np.asarray(weights, dtype=np.asarray(rgb).dtype if hasattr(rgb, "dtype") else np.float32)
    assert len(weights) == 3
    gray = np.tensordot(rgb, weights, axes=((-1,), (0,)))
    if keepchanneldim:
        return gray[..., None]
    return gray


def gamma_correction(vals, gamma=2.2):
    """Rec. 709 gamma curve (image.py:225-248): linear below cc=0.018
    with matched slope, ``1.099 v^(1/gamma) - 0.099`` above."""
    cc = 0.018
    inv_gam = 1 / gamma
    clip_val = (1.099 * np.power(cc, inv_gam) - 0.099) / cc
    return np.where(vals < cc, vals * clip_val, 1.099 * np.power(vals, inv_gam) - 0.099)


def get_max_val(img, nbits=None):
    """Max value for the image's bit depth (image.py:251-278)."""
    assert img.dtype not in FLOAT_DTYPES
    if nbits is None:
        nbits = int(np.ceil(np.log2(img.max() + 1e-9))) if img.max() > 0 else 8
    if nbits not in SUPPORTED_BIT_DEPTH:
        nbits = SUPPORTED_BIT_DEPTH[nbits < SUPPORTED_BIT_DEPTH][0]
    return 2**nbits - 1


def autocorr2d(vals, pad_mode="reflect"):
    """2-D autocorrelation via FFT with reflect padding, normalized and
    center-cropped to the input shape (image.py:363-394)."""
    shape = vals.shape
    padded = np.pad(vals, ((shape[0] // 2, shape[0] // 2), (shape[1] // 2, shape[1] // 2)),
                    mode=pad_mode)
    X = np.fft.rfft2(padded)
    autocorr = np.fft.ifftshift(np.fft.irfft2(X * np.conj(X), s=padded.shape))
    autocorr = autocorr / autocorr.max()
    sy, sx = shape[0] // 2, shape[1] // 2
    return autocorr[sy : sy + shape[0], sx : sx + shape[1]]


def rgb2bayer(img, pattern="RGGB"):
    """RGB -> 4-channel Bayer mosaic (image.py:416-470)."""
    assert len(pattern) == 4 and set(pattern.upper()) <= set("RGB")
    pattern = pattern.upper()
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    img = img[:h, :w]
    chan = {"R": 0, "G": 1, "B": 2}
    bayer = np.zeros((h // 2, w // 2, 4), dtype=img.dtype)
    for i, p in enumerate(pattern):
        dy, dx = i // 2, i % 2
        bayer[:, :, i] = img[dy::2, dx::2, chan[p]]
    return bayer


def bayer2rgb(bayer, pattern="RGGB"):
    """4-channel Bayer -> RGB by averaging the two greens
    (image.py:473-530)."""
    pattern = pattern.upper()
    h, w = bayer.shape[:2]
    rgb = np.zeros((h, w, 3), dtype=np.float32)
    counts = np.zeros(3, np.float32)
    chan = {"R": 0, "G": 1, "B": 2}
    for i, p in enumerate(pattern):
        rgb[:, :, chan[p]] += bayer[:, :, i].astype(np.float32)
        counts[chan[p]] += 1
    rgb /= np.maximum(counts, 1)
    return rgb.astype(bayer.dtype) if bayer.dtype in FLOAT_DTYPES else rgb


def bayer2rgb_cc(
    img,
    nbits,
    down=None,
    blue_gain=None,
    red_gain=None,
    black_level=None,
    ccm=None,
    nbits_out=None,
):
    """Raspberry Pi HQ ISP chain, numerically identical to the reference
    (image.py:281-349): demosaic -> optional downsample -> black-level
    subtraction -> white-balance gains -> normalize by
    ``2**nbits - 1 - black_level`` -> clip top -> color correction matrix
    -> clip [0, 1] -> requantize to ``nbits_out``."""
    from ..hardware.constants import (
        RPI_HQ_CAMERA_BLACK_LEVEL,
        RPI_HQ_CAMERA_CCM_MATRIX,
    )

    assert len(img.shape) == 2, "2D Bayer mosaic expected"
    if nbits_out is None:
        nbits_out = nbits
    dtype = np.uint16 if nbits_out > 8 else np.uint8
    if ccm is None:
        ccm = RPI_HQ_CAMERA_CCM_MATRIX
    if black_level is None:
        black_level = RPI_HQ_CAMERA_BLACK_LEVEL

    # demosaic (assumes RGGB like picamerax)
    img = img.astype(np.uint16) if img.dtype not in (np.uint8, np.uint16) else img
    rgb = cv2.cvtColor(img, cv2.COLOR_BayerRG2RGB)

    if down is not None:
        rgb = resize(rgb[None, ...], factor=1 / down)[0]

    # black level removal (no lower clip — the reference lets negatives
    # flow into the gains/CCM, image.py:339-346)
    rgb = rgb.astype(np.float64) - black_level

    # white balance
    if red_gain:
        rgb[:, :, 0] *= red_gain
    if blue_gain:
        rgb[:, :, 2] *= blue_gain

    # normalize by the usable range BEFORE the CCM (image.py:344-345)
    rgb = rgb / (2**nbits - 1 - black_level)
    rgb[rgb > 1] = 1

    # color correction
    rgb = rgb @ ccm.T
    rgb = np.clip(rgb, 0, 1)
    return (rgb * (2**nbits_out - 1)).astype(dtype)


def print_image_info(img):
    print(f"dimensions : {img.shape}")
    print(f"data type : {img.dtype}")
    print(f"max  : {img.max()}")
    print(f"min  : {img.min()}")
    print(f"mean : {img.mean()}")
