"""Loss functions for tomographic retrieval.

TPU-native re-design of the reference loss framework
(/root/reference/sph_raytracer/loss.py:1-161).  Same surface — a ``Loss``
base with ``projection_mask`` / ``volume_mask`` / weight ``lam`` /
``kind ∈ {fidelity, regularizer, oracle}``, concrete ``SquareLoss`` /
``SquareRelLoss`` / ``AbsLoss`` / ``CheaterLoss`` / ``NegRegularizer`` /
``NegSumRegularizer``, and scalar weighting via ``5 * MyLoss()`` — but
``compute`` must be pure/jit-traceable, masking uses branchless ``where``
(no boolean indexing), and oracle losses are excluded from the gradient
with ``stop_gradient`` instead of torch's ``no_grad`` tape control.

Deliberate divergence: ``__mul__`` returns a *new* Loss instead of
mutating self (reference loss.py:73-80 mutates, so ``a = 2*l; b = 3*l``
silently aliases — a footgun we fix).
"""
from __future__ import annotations

import copy

import jax
import jax.numpy as jnp

__all__ = [
    "Loss",
    "SquareLoss",
    "SquareRelLoss",
    "AbsLoss",
    "CheaterLoss",
    "NegRegularizer",
    "NegSumRegularizer",
]


class Loss:
    """Loss function for tomographic retrieval.

    Args:
        projection_mask: multiplicative mask over column densities.
        volume_mask: multiplicative mask over voxels.
        lam: loss weight (also settable as ``lam * MyLoss()``).
        use_grad: whether this loss contributes to the optimization
            gradient; when False its value is logged but stop_gradient'd
            (reference loss.py:53-71 semantics under autodiff-by-tracing).

    ``kind`` drives the progress-meter bucketing and gradient exclusion of
    oracle losses (reference loss.py:27; retrieval.py:98-105).

    Usage::

        gd(..., loss_fns=[5 * SquareLoss(), 0.1 * NegRegularizer()])
    """

    kind = "regularizer"

    def __init__(self, *args, projection_mask=1, volume_mask=1, lam=1,
                 use_grad=True, **kwargs):
        self.projection_mask = projection_mask
        self.volume_mask = volume_mask
        self.lam = lam
        self.use_grad = use_grad

    def compute(self, f, y, d, c):
        """Compute the raw loss.

        Args:
            f: forward operator (density → projections).
            y: measurement stack.
            d: density volume.
            c: model coefficients.

        Returns:
            scalar loss.
        """
        raise NotImplementedError

    def __call__(self, f, y, d, c):
        result = self.compute(f, y, d, c)
        if result is None:
            return None
        if not self.use_grad:
            result = jax.lax.stop_gradient(result)
        return self.lam * result

    def __mul__(self, other):
        new = copy.copy(self)
        new.lam = self.lam * other
        return new

    def __rmul__(self, other):
        return self.__mul__(other)

    def __repr__(self):
        return f"{self.lam:.0e} * {type(self).__name__}"


class SquareLoss(Loss):
    """Mean L2 loss on projections (reference loss.py:87-95)."""

    kind = "fidelity"

    def compute(self, f, y, d, c):
        return jnp.mean(self.projection_mask * (y - f(d * self.volume_mask)) ** 2)


class SquareRelLoss(Loss):
    """Mean squared relative error, zero-measurement pixels masked out
    (reference loss.py:98-114)."""

    kind = "fidelity"

    def compute(self, f, y, d, c):
        obs = f(d * self.volume_mask)
        nonzero = y != 0
        rel_err = jnp.where(nonzero, (y - obs) / jnp.where(nonzero, y, 1.0), 0.0)
        return jnp.mean((self.projection_mask * rel_err) ** 2)


class AbsLoss(Loss):
    """Mean L1 loss on projections (reference loss.py:117-124)."""

    kind = "fidelity"

    def compute(self, f, y, d, c):
        return jnp.mean(self.projection_mask * jnp.abs(y - f(d * self.volume_mask)))


class CheaterLoss(Loss):
    """Oracle L2 loss against a known ground-truth density
    (reference loss.py:128-147).  ``kind='oracle'`` keeps it out of the
    optimization objective; it is logged for convergence monitoring."""

    kind = "oracle"

    def __init__(self, density_truth, *args, **kwargs):
        self.density_truth = jnp.asarray(density_truth)
        super().__init__(**kwargs)

    def compute(self, f, y, d, c):
        return jnp.mean(self.volume_mask * (d - self.density_truth) ** 2)


class NegRegularizer(Loss):
    """Mean magnitude of negative voxels (reference loss.py:150-156)."""

    def compute(self, f, y, d, c):
        return jnp.mean(jnp.abs(self.volume_mask * jnp.clip(d, max=0)))


class NegSumRegularizer(Loss):
    """Sum magnitude of negative voxels (reference loss.py:158-161)."""

    def compute(self, f, y, d, c):
        return jnp.sum(jnp.abs(self.volume_mask * jnp.clip(d, max=0)))


class TVRegularizer(Loss):
    """Anisotropic total-variation regularizer over the voxel axes — not in
    the reference, but named in the driver benchmark config
    (BASELINE.json configs[2]); periodic wrap on the azimuth axis."""

    def __init__(self, *args, periodic_azimuth=True, **kwargs):
        super().__init__(*args, **kwargs)
        self.periodic_azimuth = periodic_azimuth

    def compute(self, f, y, d, c):
        d = d * self.volume_mask
        tv = (
            jnp.mean(jnp.abs(jnp.diff(d, axis=-3)))
            + jnp.mean(jnp.abs(jnp.diff(d, axis=-2)))
        )
        if self.periodic_azimuth:
            tv = tv + jnp.mean(jnp.abs(d - jnp.roll(d, 1, axis=-1)))
        else:
            tv = tv + jnp.mean(jnp.abs(jnp.diff(d, axis=-1)))
        return tv


__all__.append("TVRegularizer")


class PoissonLoss(Loss):
    """Poisson negative log-likelihood on projections — the physical
    noise model for photon-counting detectors (the reference's
    application domain is UV-photometer exosphere tomography, but it
    ships only Gaussian-type losses, loss.py:87-124).

    NLL(y | rate) = mean(rate - y*log(rate)) up to a constant, with the
    predicted rate floored at ``eps`` for differentiability at zero.
    ``scale`` converts line integrals to expected counts (instrument
    sensitivity x exposure).
    """

    kind = "fidelity"

    def __init__(self, *args, scale=1.0, eps=1e-12, **kwargs):
        super().__init__(*args, **kwargs)
        self.scale = scale
        self.eps = eps

    def compute(self, f, y, d, c):
        rate = jnp.maximum(self.scale * f(d * self.volume_mask), self.eps)
        nll = rate - y * jnp.log(rate)
        return jnp.mean(self.projection_mask * nll)


__all__.append("PoissonLoss")
