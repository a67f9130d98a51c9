"""Spherical-harmonic volume model.

A TPU-first model family with no reference analog (the reference ships
only voxel-identity and fixed phantoms, model.py:42-114): the volume is a
low-order angular expansion with free radial profiles,

    v[r, e, a] = sum_k  c[k, r] * Y_k(e, a),       k = (l, m), l <= lmax

the natural parameterization for the reference's own application domain
(exosphere tomography, where retrievals are regularized by bandlimiting
the angular structure).  Evaluating the model is a single dense
(K x Nr) @ (K x Ne*Na) contraction — an MXU matmul — so it costs nothing
next to the projection, and it shrinks the coefficient space from
Nr*Ne*Na voxels to K*Nr (e.g. 50^3 -> 25*50 at lmax=4), which both
conditions and accelerates `gd` retrievals.

The real orthonormal basis is precomputed host-side in numpy at
construction (associated-Legendre recursion; no scipy dependency) and
baked into the model as an f32/f64 constant.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model

__all__ = ["SphHarmModel", "real_sph_harm_basis"]


def _assoc_legendre(lmax: int, x: np.ndarray) -> np.ndarray:
    """All associated Legendre P_l^m(x) for 0 <= m <= l <= lmax.

    Returns (lmax+1, lmax+1, *x.shape) with [l, m] slots (m > l zero).
    No Condon-Shortley phase (it cancels in a real fitting basis).
    Standard stable recursions:
      P_m^m     = (2m-1)!! (1-x^2)^{m/2}
      P_{m+1}^m = (2m+1) x P_m^m
      P_l^m     = ((2l-1) x P_{l-1}^m - (l+m-1) P_{l-2}^m) / (l-m)
    """
    x = np.asarray(x, np.float64)
    P = np.zeros((lmax + 1, lmax + 1) + x.shape)
    s = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    pmm = np.ones_like(x)
    for m in range(lmax + 1):
        P[m, m] = pmm
        if m + 1 <= lmax:
            P[m + 1, m] = (2 * m + 1) * x * pmm
        for l in range(m + 2, lmax + 1):
            P[l, m] = ((2 * l - 1) * x * P[l - 1, m]
                       - (l + m - 1) * P[l - 2, m]) / (l - m)
        pmm = pmm * s * (2 * m + 1)
    return P


def real_sph_harm_basis(lmax: int, e: np.ndarray, a: np.ndarray
                        ) -> np.ndarray:
    """Real orthonormal spherical harmonics on an (elevation, azimuth) grid.

    Args:
        lmax: maximum degree; K = (lmax+1)^2 basis functions.
        e: elevation angles from +Z in [0, pi], shape (Ne,).
        a: azimuth angles in [-pi, pi), shape (Na,).

    Returns (K, Ne, Na) float64, ordered (l, m) = (0,0), (1,-1), (1,0),
    (1,1), (2,-2), ...  Orthonormal under the sphere measure
    sin(e) de da: integral(Y_i * Y_j) = delta_ij.
    """
    e = np.asarray(e, np.float64).reshape(-1)
    a = np.asarray(a, np.float64).reshape(-1)
    P = _assoc_legendre(lmax, np.cos(e))  # (L+1, L+1, Ne)
    from math import factorial
    K = (lmax + 1) ** 2
    Y = np.zeros((K, e.size, a.size))
    k = 0
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            N = np.sqrt((2 * l + 1) / (4 * np.pi)
                        * factorial(l - am) / factorial(l + am))
            pl = N * P[l, am][:, None]  # (Ne, 1)
            if m == 0:
                Y[k] = pl
            elif m > 0:
                Y[k] = np.sqrt(2.0) * pl * np.cos(m * a)[None, :]
            else:
                Y[k] = np.sqrt(2.0) * pl * np.sin(am * a)[None, :]
            k += 1
    return Y


class SphHarmModel(Model):
    """Bandlimited-angle volume model: ``coeffs[k, r]`` weight the real
    spherical harmonic ``Y_k`` on the grid's angular bin centers, with a
    free radial profile per harmonic.

    For dynamic (4D) grids coefficients grow a leading time axis:
    ``coeffs_shape == (T, K, Nr)``.

    ``__call__`` is a pure jnp einsum (one MXU matmul); the basis is a
    model constant.
    """

    def __init__(self, grid, lmax: int = 4, dtype=jnp.float32):
        self.grid = grid
        self.lmax = int(lmax)
        Y = real_sph_harm_basis(self.lmax, np.asarray(grid.e),
                                np.asarray(grid.a))
        self._Y = jnp.asarray(Y.reshape(Y.shape[0], -1), dtype)

    def __call__(self, coeffs):
        vol = jnp.einsum("...kr,kp->...rp", jnp.asarray(coeffs), self._Y)
        return vol.reshape(tuple(self.grid.shape))

    @property
    def coeffs_shape(self):
        shape = tuple(self.grid.shape)
        K = (self.lmax + 1) ** 2
        return shape[:-3] + (K, shape[-3])

    def fit(self, volume):
        """Least-squares projection of a voxel volume onto the model
        (host-side numpy; useful for initializing retrievals)."""
        shape = tuple(self.grid.shape)
        nr = shape[-3]
        # (..., Nr, P) -> (P, ...*Nr): one batched lstsq against Y^T
        v = np.asarray(volume, np.float64).reshape(-1, nr,
                                                   shape[-2] * shape[-1])
        Y = np.asarray(self._Y, np.float64)  # (K, P)
        sol = np.linalg.lstsq(Y.T, v.reshape(-1, v.shape[-1]).T,
                              rcond=None)[0]  # (K, batch*Nr)
        K = sol.shape[0]
        c = np.moveaxis(sol.reshape(K, -1, nr), 0, 1)  # (batch, K, Nr)
        return jnp.asarray(c.reshape(self.coeffs_shape), self._Y.dtype)

    def __repr__(self):
        return (f"SphHarmModel(grid={tuple(self.grid.shape)}, "
                f"lmax={self.lmax})")
