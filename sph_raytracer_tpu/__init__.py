"""sph_raytracer_tpu — TPU-native differentiable spherical-grid raytracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch library ``Evidlo/sph_raytracer``: raytraces 3D and
time-varying 4D density volumes on spherical voxel grids through
arbitrary detectors, producing differentiable line integrals, plus a
tomographic retrieval stack (parametric models, losses, optax-based
gradient descent) and matplotlib visualization.

Package API mirrors the reference (__init__.py:1-2): ``Operator`` and all
geometry classes at top level; models / losses / retrieval / plotting by
submodule.
"""

from .grid import SphericalGrid
from .operator import Operator
from .viewgeom import (
    ConeCircGeom,
    ConeRectGeom,
    ParallelGeom,
    ViewGeom,
    ViewGeomCollection,
)
from .config import TraceConfig
from .tune import autotune

# submodules (imported lazily by attribute in the reference; eager here so
# `sph_raytracer_tpu.loss` etc. work after a bare package import)
from . import loss, models, plotting, retrieval, solve, utils  # noqa: E402,F401

__all__ = [
    "SphericalGrid",
    "Operator",
    "ViewGeom",
    "ViewGeomCollection",
    "ConeRectGeom",
    "ConeCircGeom",
    "ParallelGeom",
    "TraceConfig",
    "autotune",
    "loss",
    "models",
    "plotting",
    "retrieval",
    "solve",
    "utils",
]

__version__ = "0.1.0"
