"""Tomographic retrieval: gradient-descent driver.

TPU-native re-design of the reference retrieval module
(/root/reference/sph_raytracer/retrieval.py:24-127).  Same contract —
``gd(f, y, model, ...)`` minimizes a weighted sum of loss functions over
model coefficients and returns ``(best_coeffs, f(model(best_coeffs)),
losses)`` with a per-iteration per-loss history dict, Ctrl-C early stop,
and an optional per-step ``model.proj`` coefficient projection — but the
optimizer is optax and the optimization loop is a *compiled* ``lax.scan``:
loss history and best-coefficient tracking are carried inside the scan, so
one device round-trip happens per chunk of iterations instead of per
iteration.  Ctrl-C lands on chunk boundaries.

Adds what the reference lacks (SURVEY §5.3/§5.4): checkpoint/resume of
(coeffs, opt state, iteration) via ``checkpoint_every``/``checkpoint_path``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .loss import SquareLoss
from .utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["gd", "detach_loss"]


def detach_loss(loss):
    """Convert an on-device loss value to a plain float
    (reference retrieval.py:11-22)."""
    return float(loss) if loss is not None else loss


def gd(f, y, model, coeffs=None, num_iterations=100,
       loss_fns=None, optim=optax.adam, progress_bar=True,
       chunk: Optional[int] = None, checkpoint_path: Optional[str] = None,
       checkpoint_every: int = 0, resume: bool = False, **kwargs):
    """Gradient descent to minimize a weighted sum of losses.

    Minimizes ``sum(loss_fn(f, y, model(coeffs), coeffs))`` over the
    non-oracle loss functions with respect to ``coeffs``.  Use Ctrl-C to
    stop early and return the best result so far (reference
    retrieval.py:34, 122-124; granularity = ``chunk`` iterations).

    Args:
        f: forward operator (density → projections) with a ``.grid``.
        y: measurement stack matching ``f``'s output shape.
        model: :class:`~sph_raytracer_tpu.models.Model` instance.
        coeffs: initial coefficients (default ``ones(model.coeffs_shape)``,
            reference retrieval.py:64-70).  May be any pytree (e.g. a dict
            of arrays): the whole tree is optimized and passed to
            ``model``/losses.  This subsumes the reference's ``optim_vars``
            list (retrieval.py:75-79) — torch mutates extra tensors that a
            model closes over; the functional JAX equivalent is to make
            them explicit coefficient leaves.
        num_iterations: gradient steps.
        loss_fns: list of :class:`~sph_raytracer_tpu.loss.Loss` (default
            ``[SquareLoss()]``).
        optim: an ``optax.GradientTransformation``, or a factory like
            ``optax.adam`` instantiated with ``**kwargs``
            (default Adam, lr 1e-3 — torch's default, matching the
            reference's ``t.optim.Adam``).
        progress_bar: show tqdm progress with F/R/O loss buckets
            (reference retrieval.py:109).
        chunk: iterations per compiled ``lax.scan`` chunk (device
            round-trips — loss-history fetch, Ctrl-C granularity —
            happen once per chunk).  Default 16 on CPU, 100 on
            accelerators, where per-dispatch latency (seconds through a
            relayed TPU) would otherwise dominate millisecond steps.
        checkpoint_path / checkpoint_every: if set, save (coeffs, opt
            state, iteration) every N iterations; ``resume=True`` restarts
            from the checkpoint.

    Returns:
        (best_coeffs, f(model(best_coeffs)), losses) where ``losses`` maps
        each loss_fn to its per-iteration float history.
    """
    if "optim_vars" in kwargs:
        raise TypeError(
            "optim_vars is torch-specific (the reference's models mutate "
            "closed-over tensors; reference retrieval.py:75-79).  Pass a "
            "pytree as `coeffs` instead — every leaf is optimized and the "
            "whole tree reaches model(coeffs) and the losses.")
    if loss_fns is None:
        loss_fns = [SquareLoss()]
    if chunk is None:
        chunk = 16 if jax.default_backend() == "cpu" else 100

    if hasattr(f, "grid") and hasattr(model, "grid") and f.grid != model.grid:
        raise ValueError("f and model must have same grid")

    if isinstance(optim, optax.GradientTransformation):
        tx = optim
    else:
        if "learning_rate" not in kwargs and "lr" not in kwargs:
            kwargs["learning_rate"] = 1e-3
        if "lr" in kwargs:
            kwargs["learning_rate"] = kwargs.pop("lr")
        tx = optim(**kwargs)

    if coeffs is None:
        coeffs = jnp.ones(model.coeffs_shape, dtype=jnp.float32)
    else:
        coeffs = jax.tree.map(jnp.asarray, coeffs)
    cdtype = jnp.result_type(*jax.tree_util.tree_leaves(coeffs))
    y = jnp.asarray(y, dtype=cdtype) if y is not None else None

    opt_state = tx.init(coeffs)
    start_iter = 0
    if resume and checkpoint_path:
        state = load_checkpoint(checkpoint_path, (coeffs, opt_state))
        if state is not None:
            (coeffs, opt_state), start_iter = state

    grad_mask = [lf.use_grad and lf.kind != "oracle" for lf in loss_fns]
    proj = getattr(model, "proj", None)

    # thread the operator's device-array state (projection tables — multi-GB
    # for routed TPU operators) and the measurements through jit boundaries
    # as *arguments*: baking them in as trace constants bloats (or, on
    # relayed TPU backends, outright breaks) compilation
    payload = getattr(f, "payload", None)

    def losses_of(c, pl=None, ym=None):
        fx = f.with_payload(pl) if pl is not None else f
        ym = y if ym is None else ym
        d = model(c)
        vals = [lf(fx, ym, d, c) for lf in loss_fns]
        tot = sum(
            (v for v, m in zip(vals, grad_mask) if m),
            start=jnp.zeros((), dtype=cdtype),
        )
        return tot, jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])

    def step(carry, _, pl, ym):
        c, s, best_loss, best_c = carry
        (tot, vals), g = jax.value_and_grad(losses_of, has_aux=True)(
            c, pl, ym)
        # track best-so-far inside the scan (reference retrieval.py:111-113)
        better = tot < best_loss
        best_loss = jnp.where(better, tot, best_loss)
        best_c = jax.tree.map(lambda a, b: jnp.where(better, a, b), c, best_c)
        updates, s = tx.update(g, s, c)
        c = optax.apply_updates(c, updates)
        if proj is not None:
            c = proj(c)
        return (c, s, best_loss, best_c), vals

    @partial(jax.jit, static_argnums=3)
    def run_chunk(carry, pl, ym, length):
        return jax.lax.scan(
            lambda cy, x: step(cy, x, pl, ym), carry, None, length=length)

    pbar = None
    if progress_bar:
        try:
            from tqdm import tqdm

            pbar = tqdm(total=num_iterations, initial=start_iter)
        except ImportError:
            pbar = None

    losses = {lf: [] for lf in loss_fns}
    tot_dtype = jax.eval_shape(losses_of, coeffs)[0].dtype
    carry = (coeffs, opt_state, jnp.asarray(np.inf, tot_dtype), coeffs)
    it = start_iter
    try:
        while it < num_iterations:
            n = min(chunk, num_iterations - it)
            carry, vals = run_chunk(carry, payload, y, n)
            vals = np.asarray(vals)  # (n, n_losses)
            for j, lf in enumerate(loss_fns):
                losses[lf].extend(vals[:, j].tolist())
            it += n
            if pbar is not None:
                f_stat = sum(
                    vals[-1, j] for j, lf in enumerate(loss_fns)
                    if lf.kind == "fidelity"
                )
                r_stat = sum(
                    vals[-1, j] for j, lf in enumerate(loss_fns)
                    if lf.kind == "regularizer"
                )
                o_stat = sum(
                    vals[-1, j] for j, lf in enumerate(loss_fns)
                    if lf.kind == "oracle"
                )
                pbar.set_description(
                    f"F:{f_stat:.1e} R:{r_stat:.1e} O:{o_stat * 100:.0f}"
                )
                pbar.update(n)
            if checkpoint_path and checkpoint_every and (
                it % checkpoint_every < chunk
            ):
                save_checkpoint(checkpoint_path, (carry[0], carry[1]), it)
    except KeyboardInterrupt:
        pass
    finally:
        if pbar is not None:
            pbar.close()

    _, _, best_loss, best_coeffs = carry
    if not np.isfinite(float(best_loss)):
        best_coeffs = carry[0]
    y_result = f(model(best_coeffs))
    return best_coeffs, y_result, losses
