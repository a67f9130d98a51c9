"""Device mesh construction and multi-host initialization (SURVEY N1).

The canonical mesh for this workload is one-dimensional over the ray axis:
rays are independent (the "data parallel" axis of raytracing, SURVEY §5.7),
the volume is replicated, and the only collective is the ``psum`` of
density/coefficient gradients in the backward pass (N3).  On a multi-host
pod slice the same axis simply spans all chips — XLA routes the psum over
ICI within a slice and DCN across slices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "distributed_init"]

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None, axis: str = RAY_AXIS) -> Mesh:
    """1-D device mesh over the ray axis.

    Args:
        devices: devices to include — a sequence of jax devices, or an
            int to take the first N of ``jax.devices()`` (default all).
        axis: mesh axis name.
    """
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        avail = jax.devices()
        if devices > len(avail):
            raise ValueError(
                f"make_mesh({devices}) but only {len(avail)} devices")
        devices = avail[:devices]
    return Mesh(np.asarray(list(devices)), (axis,))


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None, **kwargs) -> None:
    """Initialize multi-host JAX (``jax.distributed.initialize`` wrapper).

    On TPU pods all arguments are auto-detected from the environment; call
    this once per host before building meshes.  No-op if already
    initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
