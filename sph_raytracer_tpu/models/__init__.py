"""Parametric volume models for tomographic retrieval.

TPU-native re-design of the reference model framework
(/root/reference/sph_raytracer/model.py:1-114).  Same protocol —
``Model(grid)`` instances are callables ``coeffs → volume`` with a
``coeffs_shape`` property and an optional ``proj(coeffs)`` projection hook
applied after each optimizer step (reference retrieval.py:119-121) — but
models must be *pure functions* of their coefficients so the whole
retrieval step jits: phantom volumes are precomputed host-side numpy and
closed over as constants.
"""
from .base import (
    AxisAlignmentModel,
    CubesModel,
    FullyDenseModel,
    Model,
)
from .sphharm import SphHarmModel, real_sph_harm_basis

__all__ = ["Model", "FullyDenseModel", "CubesModel", "AxisAlignmentModel",
           "SphHarmModel", "real_sph_harm_basis"]
