"""Data I/O: load/save PSFs and measurements (reference:
lensless/utils/io.py).

Parity highlights:

* ``load_psf``: background estimated from a corner patch ``bg_pix`` mean
  and subtracted per channel (io.py:337-356), optional downsample,
  ``single_psf`` channel-sum (io.py:361-370), **L2 normalization**
  ``psf /= ||psf||_2`` (io.py:375), 3-D ``.npy``/``.npz`` stacks
  (io.py:279-291), canonical (depth, H, W, C) output;
* ``load_data``: joint PSF + measurement loading with matched
  processing, background subtraction with the PSF's background level,
  shape matching to the PSF grid (io.py:389-600);
* ``load_image``: PNG/JPG/TIFF via cv2 (BGR input flipped to RGB like
  io.py:87-95), raw Bayer paths incl. DNG (gated on rawpy) with the RPi
  ISP chain, flips, background subtraction, float normalization;
* ``save_image``: float -> uint8 normalization (io.py:603-642).
"""

from __future__ import annotations

import os.path
import warnings

import cv2
import numpy as np

from .image import bayer2rgb_cc, get_max_val, print_image_info, resize, rgb2gray


def load_image(
    fp,
    verbose=False,
    flip=False,
    flip_ud=False,
    flip_lr=False,
    bayer=False,
    black_level=None,
    blue_gain=None,
    red_gain=None,
    ccm=None,
    back=None,
    nbits_out=None,
    as_4d=False,
    downsample=None,
    bg=None,
    return_float=False,
    shape=None,
    dtype=None,
    normalize=True,
    bgr_input=True,
):
    """Load image file to numpy (io.py:21-207)."""
    assert os.path.isfile(fp), f"file not found: {fp}"

    if fp.endswith(".npy"):
        img = np.load(fp)
    elif fp.lower().endswith(".dng"):
        try:
            import rawpy
        except ImportError as e:
            raise ImportError("rawpy required for DNG files (not in this env)") from e
        raw = rawpy.imread(fp)
        img = raw.raw_image
        ccm = raw.color_matrix[:, :3] if ccm is None else ccm
        black_level = np.min(raw.black_level_per_channel) if black_level is None else black_level
        bayer = True
    else:
        img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
        assert img is not None, f"could not read image: {fp}"

    if bayer:
        assert len(img.shape) == 2, "bayer image should be 2D"
        nbits = int(np.ceil(np.log2(img.max() + 1)))
        img = bayer2rgb_cc(
            img,
            nbits=nbits,
            blue_gain=blue_gain,
            red_gain=red_gain,
            black_level=black_level,
            ccm=ccm,
            nbits_out=nbits_out,
        )
    elif len(img.shape) == 3 and img.shape[2] == 3 and bgr_input:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    original_dtype = img.dtype

    if flip:
        img = np.flipud(img)
        img = np.fliplr(img)
    if flip_ud:
        img = np.flipud(img)
    if flip_lr:
        img = np.fliplr(img)

    if bg is not None:
        bg = np.asarray(bg)
        # float (normalized) background + integer image: rescale to the
        # image's bit-depth max before subtracting (io.py:149-155)
        if bg.max() <= 1 and img.dtype not in (np.float32, np.float64):
            bg = bg * get_max_val(img)
        img = img.astype(np.float32) - bg
        img = np.clip(img, a_min=0, a_max=img.max())

    if as_4d:
        if len(img.shape) == 3:
            img = img[np.newaxis]
        elif len(img.shape) == 2:
            img = img[np.newaxis, :, :, np.newaxis]

    if downsample is not None or shape is not None:
        if downsample is not None:
            factor = 1.0 / downsample
        else:
            factor = None
        was_4d = len(img.shape) == 4
        img4 = img if was_4d else (img[np.newaxis] if img.ndim == 3 else img[np.newaxis, :, :, np.newaxis])
        img4 = resize(img4, factor=factor, shape=shape)
        img = img4 if was_4d else (img4[0] if img.ndim >= 3 else img4[0, :, :, 0])

    if return_float:
        out_dtype = np.float32 if dtype is None else dtype
        assert out_dtype in (np.float32, np.float64)
        img = img.astype(out_dtype)
        if normalize:
            peak = img.max()
            if peak > 0:
                img /= peak
    else:
        img = img.astype(original_dtype if dtype is None else dtype)

    if verbose:
        print_image_info(img)
    return img


def load_psf(
    fp,
    downsample=1,
    return_float=True,
    bg_pix=(5, 25),
    return_bg=False,
    flip=False,
    flip_ud=False,
    flip_lr=False,
    verbose=False,
    bayer=False,
    blue_gain=None,
    red_gain=None,
    dtype=np.float32,
    nbits_out=None,
    single_psf=False,
    shape=None,
    use_3d=False,
    bgr_input=True,
    force_rgb=False,
):
    """Load + process PSF to (depth, H, W, C) (io.py:210-386)."""
    if use_3d:
        assert os.path.isfile(fp)
        if fp.endswith(".npy"):
            psf = np.load(fp)
        elif fp.endswith(".npz"):
            archive = np.load(fp)
            if len(archive.files) == 0:
                raise ValueError("No arrays in .npz archive")
            if len(archive.files) > 1:
                warnings.warn("more than one array in .npz archive, using first")
            psf = archive[archive.files[0]]
        else:
            raise ValueError("3D PSF must be .npy or .npz")
    else:
        psf = load_image(
            fp, flip=flip, flip_ud=flip_ud, flip_lr=flip_lr, bayer=bayer,
            blue_gain=blue_gain, red_gain=red_gain, nbits_out=nbits_out,
            bgr_input=bgr_input,
        )

    original_dtype = psf.dtype
    max_val = get_max_val(psf) if psf.dtype not in (np.float32, np.float64) else psf.max()
    psf = np.array(psf, dtype=dtype)

    if force_rgb and len(psf.shape) == 2:
        psf = np.stack([psf] * 3, axis=2)

    if use_3d:
        grayscale = len(psf.shape) == 3
        if grayscale:
            psf = psf[:, :, :, np.newaxis]
        else:
            assert len(psf.shape) == 4
    else:
        if len(psf.shape) == 3:
            grayscale = False
            psf = psf[np.newaxis]
        else:
            assert len(psf.shape) == 2
            grayscale = True
            psf = psf[np.newaxis, :, :, np.newaxis]

    # background subtraction from corner patch (io.py:337-356)
    if bg_pix is None:
        bg = np.zeros(psf.shape[-1])
    else:
        bg = []
        for i in range(psf.shape[3]):
            bg_i = np.mean(psf[:, bg_pix[0] : bg_pix[1], bg_pix[0] : bg_pix[1], i])
            psf[:, :, :, i] -= bg_i
            bg.append(bg_i)
        psf = np.clip(psf, a_min=0, a_max=psf.max())
        bg = np.array(bg)

    if downsample != 1 or shape is not None:
        psf = resize(psf, shape=shape, factor=1 / downsample)

    if single_psf:
        if not grayscale:
            psf = np.sum(psf, axis=3, keepdims=True)
        else:
            warnings.warn("single_psf has no effect for grayscale psf")

    if return_float:
        psf /= np.linalg.norm(psf.ravel())  # io.py:375
        bg = np.asarray(bg) / max_val
    else:
        psf = psf.astype(original_dtype)

    if verbose:
        print_image_info(psf)
    return (psf, bg) if return_bg else psf


def load_data(
    psf_fp,
    data_fp,
    return_float=True,
    downsample=None,
    bg_pix=(5, 25),
    flip=False,
    flip_ud=False,
    flip_lr=False,
    bayer=False,
    blue_gain=None,
    red_gain=None,
    gray=False,
    dtype=np.float32,
    single_psf=False,
    shape=None,
    normalize=False,
    bgr_input=True,
    use_3d=False,
):
    """Joint PSF + measurement loading (io.py:389-600). Returns
    (psf (D,H,W,C), data (D,H,W,C)) processed consistently."""
    assert os.path.isfile(psf_fp)
    assert os.path.isfile(data_fp)
    if shape is None:
        assert downsample is not None

    psf, bg = load_psf(
        psf_fp, downsample=downsample or 1, return_float=return_float,
        bg_pix=bg_pix, return_bg=True, flip=flip, flip_ud=flip_ud,
        flip_lr=flip_lr, bayer=bayer, blue_gain=blue_gain, red_gain=red_gain,
        dtype=dtype, single_psf=single_psf, shape=shape, use_3d=use_3d,
        bgr_input=bgr_input,
    )

    data = load_image(
        data_fp, flip=flip, flip_ud=flip_ud, flip_lr=flip_lr, bayer=bayer,
        blue_gain=blue_gain, red_gain=red_gain, bg=bg, as_4d=True,
        return_float=return_float, shape=psf.shape, normalize=normalize,
        bgr_input=bgr_input, dtype=dtype,
    )

    if data.shape[-3:-1] != psf.shape[-3:-1]:
        data = resize(data, shape=psf.shape)

    if gray:
        psf = rgb2gray(psf[0])[None] if psf.shape[-1] == 3 else psf
        data = rgb2gray(data[0])[None] if data.shape[-1] == 3 else data

    return psf.astype(dtype), data.astype(dtype)


def save_image(img, fp, max_val=255, normalize=True):
    """Normalize to uint8 and save (io.py:603-642)."""
    img = np.asarray(img)
    if img.ndim > 3:
        img = img.reshape(-1, *img.shape[-3:])[0]
    out = img.astype(np.float32)
    if normalize:
        out -= out.min()
        if out.max() > 0:
            out /= out.max()
    out = (np.clip(out, 0, 1) * max_val).astype(np.uint8)
    if out.shape[-1] == 3:
        out = cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
    elif out.shape[-1] == 1:
        out = out[..., 0]
    cv2.imwrite(str(fp), out)
    return fp
