"""Far-field simulation of lensless measurements.

Native implementation of the waveprop ``FarFieldSimulator`` behavior the
reference wraps (lensless/utils/simulation.py:13-167; the reference's
dependency is not re-used):

1. the object at ``scene2mask`` meters is imaged with magnification
   ``m = mask2sensor / scene2mask``; its physical height maps to
   ``object_height * m / pixel_height`` sensor pixels;
2. the resized object is pasted centered (or randomly shifted) onto a
   sensor-resolution canvas -> the "lensed" / object-plane image;
3. if a PSF is given, the canvas is convolved with it (same-size FFT
   convolution) -> the lensless measurement;
4. optional shot noise at ``snr_db`` and quantization to ``max_val``.

Object-plane geometry uses the VirtualSensor dimensions
(hardware/sensor.py).  All heavy math is jnp (jittable, batchable).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..hardware.sensor import VirtualSensor
from ..ops.fft_conv import FFTConvolver
from ..ops.noise import add_shot_noise
from .image import resize as _np_resize


class FarFieldSimulator:
    """Propagate object images through a lensless camera forward model."""

    def __init__(
        self,
        object_height: Union[float, Tuple[float, float]],
        scene2mask: float,
        mask2sensor: float,
        sensor: Union[str, "VirtualSensor"],
        psf=None,
        output_dim=None,
        snr_db: Optional[float] = None,
        max_val: int = 255,
        random_shift: bool = False,
        quantize: bool = True,
        vertical_shift: Optional[int] = None,
        horizontal_shift: Optional[int] = None,
        **kwargs,
    ):
        self.object_height = object_height
        self.scene2mask = scene2mask
        self.mask2sensor = mask2sensor
        self.sensor = (
            VirtualSensor.from_name(sensor) if isinstance(sensor, str) else sensor
        )
        self.snr_db = snr_db
        self.max_val = max_val
        self.random_shift = random_shift
        self.quantize = quantize
        self.output_dim = output_dim
        self.vertical_shift = vertical_shift
        self.horizontal_shift = horizontal_shift

        self.magnification = mask2sensor / scene2mask
        self.conv = None
        self.psf = None
        if psf is not None:
            self.set_psf(psf)

        # re-instantiation dict (simulation.py:98-112)
        self.params = {
            "object_height": object_height,
            "scene2mask": scene2mask,
            "mask2sensor": mask2sensor,
            "sensor": sensor if isinstance(sensor, str) else None,
            "output_dim": output_dim,
            "snr_db": snr_db,
            "max_val": max_val,
            "random_shift": random_shift,
            "quantize": quantize,
        }
        self.params.update(kwargs)

    # -- PSF management (simulation.py:114-141) -------------------------

    def set_psf(self, psf):
        psf = jnp.asarray(psf, jnp.float32)
        assert psf.ndim == 4, "PSF must be (depth, H, W, C)"
        assert psf.shape[-1] in (1, 3)
        self.psf = psf
        self.conv = FFTConvolver.from_psf(psf, pad=True, norm="backward")
        return self

    set_point_spread_function = set_psf

    def get_psf(self):
        return self.psf

    # -- simulation -----------------------------------------------------

    def _object_plane(self, obj: np.ndarray, key=None) -> np.ndarray:
        """Resize by magnification and paste onto the sensor canvas.

        When a PSF is set, its spatial grid defines the canvas (the PSF
        is typically a downsampled sensor measurement); physical sizes
        still come from the sensor geometry.
        """
        if self.psf is not None:
            sensor_res = tuple(int(v) for v in self.psf.shape[-3:-1])
        elif self.output_dim is not None:
            # PSF-less use (object-plane projection only): the target
            # grid defines the canvas (reference passes output_dim from
            # the PSF shape, dataset.py:1660-1666)
            sensor_res = tuple(int(v) for v in self.output_dim)
        else:
            sensor_res = tuple(int(v) for v in self.sensor.resolution)
        sensor_h_m = float(self.sensor.size[0])

        if isinstance(self.object_height, (tuple, list)):
            lo, hi = self.object_height
            if key is not None:
                height_m = float(jax.random.uniform(key, (), minval=lo, maxval=hi))
            else:
                height_m = (lo + hi) / 2.0
        else:
            height_m = float(self.object_height)

        scene_h_m = height_m * self.magnification
        obj_h_px = int(round(scene_h_m / sensor_h_m * sensor_res[0]))
        obj_h_px = max(min(obj_h_px, sensor_res[0]), 1)
        scale = obj_h_px / obj.shape[-3]
        obj_w_px = max(min(int(round(obj.shape[-2] * scale)), sensor_res[1]), 1)

        obj4 = obj if obj.ndim == 4 else obj[None]
        resized = _np_resize(np.asarray(obj4), shape=(obj_h_px, obj_w_px, obj4.shape[-1]))

        canvas = np.zeros((obj4.shape[0],) + sensor_res + (obj4.shape[-1],), np.float32)
        if self.random_shift and key is not None:
            ky, kx = jax.random.split(key)
            y0 = int(jax.random.randint(ky, (), 0, sensor_res[0] - obj_h_px + 1))
            x0 = int(jax.random.randint(kx, (), 0, sensor_res[1] - obj_w_px + 1))
        else:
            y0 = (sensor_res[0] - obj_h_px) // 2
            x0 = (sensor_res[1] - obj_w_px) // 2
        canvas[:, y0 : y0 + obj_h_px, x0 : x0 + obj_w_px, :] = resized
        # alignment shifts (reference applies torch.roll on the lensed
        # plane, dataset.py:727-731 / waveprop vertical/horizontal_shift)
        if self.vertical_shift:
            canvas = np.roll(canvas, self.vertical_shift, axis=-3)
        if self.horizontal_shift:
            canvas = np.roll(canvas, self.horizontal_shift, axis=-2)
        return canvas if obj.ndim == 4 else canvas[0]

    def propagate_image(self, obj, return_object_plane: bool = False, key=None):
        """Simulate the measurement for an HWC (or DHWC) object image
        (simulation.py:143-167)."""
        assert obj.shape[-1] in (1, 3), "image must have 1 or 3 channels"
        obj = np.asarray(obj, np.float32)
        if self.psf is not None and self.psf.shape[-1] == 3 and obj.shape[-1] == 1:
            obj = np.repeat(obj, 3, axis=-1)  # grayscale object, RGB PSF
        obj_plane = self._object_plane(obj, key)

        if self.conv is None:
            return (obj_plane, obj_plane) if return_object_plane else obj_plane

        x = jnp.asarray(obj_plane)
        if x.ndim == 3:
            x = x[None]  # add depth
        image = self.conv.convolve(x)

        if self.snr_db is not None:
            noise_key = key if key is not None else jax.random.PRNGKey(0)
            image = add_shot_noise(image, self.snr_db, noise_key)

        if self.output_dim is not None:
            target = image.shape[:-3] + tuple(self.output_dim) + image.shape[-1:]
            image = jax.image.resize(image, target, method="linear")

        if self.quantize:
            m = jnp.max(image)
            image = jnp.where(m > 0, image / m, image) * self.max_val
            image = jnp.clip(jnp.round(image), 0, self.max_val)

        if obj.ndim == 3:
            image = image[0]
        if return_object_plane:
            return image, obj_plane
        return image

    propagate = propagate_image
