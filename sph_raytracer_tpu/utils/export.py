"""Ahead-of-time export of compiled operator programs for serving.

No reference analog (the reference is a research library; SURVEY §5 lists
no deployment story).  For production serving the projection should not
re-trace geometry or rebuild tables at process start: ``export_operator``
serializes the jitted forward / gradient-step programs (StableHLO via
``jax.export``) together with the operator's device-table payload, and
``load_exported`` restores a callable that runs without constructing an
Operator — no geometry code, no trace, no router.

The payload is threaded as *arguments* (``Operator.payload`` /
``with_payload``), so the serialized program contains no multi-GB
constants and one payload archive can be shared by several programs.

Portability follows ``jax.export`` rules: programs are portable across
processes and machines for the same platform (cpu ↔ cpu, tpu ↔ tpu of a
compatible generation); export on the platform you serve on.
"""
from __future__ import annotations

import io
import zipfile
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_operator", "load_exported"]


def _flatten_payload(payload):
    leaves, treedef = jax.tree.flatten(payload)
    return leaves, treedef


def export_operator(op, path: str, what: str = "forward",
                    loss_y: Optional[jax.Array] = None) -> None:
    """Serialize an operator program + payload to a ``.zip`` archive.

    Args:
        op: an :class:`~sph_raytracer_tpu.operator.Operator` (or
            subclass) — its current mode's compiled path is exported.
        path: output archive.
        what: ``"forward"`` (density → line integrals) or ``"grad_step"``
            (density, measurements → SquareLoss gradient w.r.t. density).
        loss_y: example measurements (only to shape ``grad_step``).
    """
    payload = op.payload
    leaves, treedef = _flatten_payload(payload)
    gshape = tuple(op.grid.shape)

    if what == "forward":
        def fn(density, *pl_leaves):
            pl = jax.tree.unflatten(treedef, pl_leaves)
            return op.with_payload(pl)(density)

        args = (jax.ShapeDtypeStruct(gshape, np.dtype(op.config.ftype)),)
    elif what == "grad_step":
        if loss_y is None:
            raise ValueError("grad_step export needs example measurements")

        def fn(density, y, *pl_leaves):
            pl = jax.tree.unflatten(treedef, pl_leaves)
            fx = op.with_payload(pl)
            return jax.grad(lambda d: jnp.mean((fx(d) - y) ** 2))(density)

        args = (jax.ShapeDtypeStruct(gshape, np.dtype(op.config.ftype)),
                jax.ShapeDtypeStruct(loss_y.shape, loss_y.dtype))
    else:
        raise ValueError(f"unknown program {what!r}")

    pl_specs = tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves)
    exp = jax.export.export(jax.jit(fn))(*args, *pl_specs)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("program.bin", exp.serialize())
        buf = io.BytesIO()
        np.savez(buf, **{f"leaf_{i}": np.asarray(l)
                         for i, l in enumerate(leaves)})
        z.writestr("payload.npz", buf.getvalue())
        z.writestr("meta.txt", what)


def load_exported(path: str) -> Callable:
    """Load an archive written by :func:`export_operator`.

    Returns a callable ``f(density, [y])`` with the payload already bound
    — ready to serve, no Operator construction involved.
    """
    with zipfile.ZipFile(path) as z:
        exp = jax.export.deserialize(z.read("program.bin"))
        with np.load(io.BytesIO(z.read("payload.npz"))) as data:
            leaves = [jnp.asarray(data[f"leaf_{i}"])
                      for i in range(len(data.files))]

    def call(*args):
        return exp.call(*args, *leaves)

    return call
