"""SphericalGrid spec tests (shape/boundary/center invariants mirroring the
reference's test_sphericalgrid_static/dynamic, test_all.py:176-223)."""
import numpy as np
import pytest

from sph_raytracer_tpu import SphericalGrid


def test_static_default():
    g = SphericalGrid(shape=(4, 5, 6))
    assert tuple(g.shape) == (4, 5, 6)
    assert not g.dynamic
    assert len(g.r_b) == 5 and len(g.e_b) == 6 and len(g.a_b) == 7
    assert g.r_b[0] == 0 and g.r_b[-1] == 1
    assert g.e_b[0] == 0 and np.isclose(g.e_b[-1], np.pi)
    assert np.isclose(g.a_b[0], -np.pi) and np.isclose(g.a_b[-1], np.pi)
    # centers are midpoints
    assert np.allclose(g.r, (g.r_b[1:] + g.r_b[:-1]) / 2)
    assert g.full_azimuth
    assert g.mesh.shape == (4, 5, 6, 3)


def test_log_spacing():
    g = SphericalGrid(shape=(4, 3, 3), size_r=(0.1, 10.0), spacing="log")
    assert np.allclose(g.r_b[0], 0.1) and np.allclose(g.r_b[-1], 10.0)
    ratios = g.r_b[1:] / g.r_b[:-1]
    assert np.allclose(ratios, ratios[0])
    # geometric-mean centers (reference geometry.py:159)
    assert np.allclose(g.r, np.sqrt(g.r_b[1:] * g.r_b[:-1]))


def test_manual_boundaries():
    r_b = [0.0, 1.0, 3.0]
    e_b = [0.0, np.pi / 2, np.pi]
    a_b = [-np.pi / 2, 0.0, np.pi / 2]
    g = SphericalGrid(r_b=r_b, e_b=e_b, a_b=a_b)
    assert tuple(g.shape) == (2, 2, 2)
    assert g.size.r == (0.0, 3.0)
    assert not g.full_azimuth
    assert not g.dynamic


def test_dynamic():
    g = SphericalGrid(shape=(7, 4, 5, 6), size_t=(0, 60))
    assert g.dynamic
    assert tuple(g.shape) == (7, 4, 5, 6)
    assert len(g.t) == 7
    assert g.nptime.dtype.kind == "M"
    assert g.mesh.shape == (7, 4, 5, 6, 4)


def test_dynamic_manual_t():
    g = SphericalGrid(
        r_b=[0, 1, 2], e_b=[0, np.pi], a_b=[-np.pi, np.pi], t=[0.0, 1.0, 2.0]
    )
    assert g.dynamic
    assert tuple(g.shape) == (3, 2, 1, 1)
    assert g.full_azimuth


def test_num_crossings():
    g = SphericalGrid(shape=(4, 5, 6))
    assert g.num_crossings == 2 * 5 + 2 * 6 + 7 + 1


def test_eq_hash():
    a = SphericalGrid(shape=(4, 5, 6))
    b = SphericalGrid(shape=(4, 5, 6))
    c = SphericalGrid(shape=(4, 5, 7))
    assert a == b and hash(a) == hash(b)
    assert a != c


def test_bad_shape():
    with pytest.raises(ValueError):
        SphericalGrid(shape=(1, 2))
    with pytest.raises(ValueError):
        SphericalGrid(shape=None)


def test_deprecated_boundary_aliases():
    """Reference-compat: rs_b/phis_b/thetas_b kwargs and attributes
    (reference geometry.py:113-130, 182)."""
    import warnings

    r_b = np.linspace(0, 1, 5)
    e_b = np.linspace(0, np.pi, 4)
    a_b = np.linspace(-np.pi, np.pi, 7)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        g = SphericalGrid(shape=None, rs_b=r_b, phis_b=e_b, thetas_b=a_b)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert np.array_equal(g.r_b, r_b) and np.array_equal(g.rs_b, r_b)
    assert np.array_equal(g.phis_b, e_b) and np.array_equal(g.thetas_b, a_b)
    assert tuple(g.shape) == (4, 3, 6)
