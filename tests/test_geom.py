"""View-geometry invariants (analogs of the reference's
test_conerectgeom/conecircgeom/parallelgeom/viewgeom, test_all.py:238-302,
written fresh from detector-physics identities)."""
import numpy as np
import pytest

from sph_raytracer_tpu import (
    ConeCircGeom,
    ConeRectGeom,
    ParallelGeom,
    ViewGeom,
    ViewGeomCollection,
)


def test_viewgeom_normalizes():
    g = ViewGeom(ray_starts=[[0.0, 0, 2]], rays=[[0.0, 0, -5]])
    assert np.allclose(np.linalg.norm(g.rays, axis=-1), 1)
    assert g.shape == (1,)


def test_conerect_defaults():
    g = ConeRectGeom((5, 5), pos=(3.0, 0, 0))
    # default lookdir aims at the origin
    assert np.allclose(g.lookdir, [-1, 0, 0])
    assert np.allclose(np.linalg.norm(g.rays, axis=-1), 1)
    # center pixel of an odd detector looks straight down lookdir
    assert np.allclose(g.rays[2, 2], g.lookdir)
    # all rays within fov/2 of lookdir
    ang = np.degrees(np.arccos(np.clip(g.rays @ g.lookdir, -1, 1)))
    assert ang.max() <= np.hypot(45 / 2, 45 / 2) + 1e-6
    # corner ray u/v components hit tan(fov/2) exactly
    u = np.cross(g.lookdir, g.updir)
    proj_u = g.rays @ u / (g.rays @ g.lookdir)
    assert np.allclose(proj_u[0, :], -np.tan(np.radians(22.5)))
    assert np.allclose(proj_u[-1, :], np.tan(np.radians(22.5)))
    assert g.ray_starts.shape == (1, 1, 3)


def test_conerect_degenerate_single_pixel():
    g = ConeRectGeom((1, 1), pos=(0, 5.0, 0), fov=(30, 30))
    assert g.rays.shape == (1, 1, 3)
    assert np.allclose(g.rays[0, 0], [0, -1, 0])


def test_conerect_custom_look_up():
    g = ConeRectGeom((3, 3), pos=(2.0, 0, 0), lookdir=(0, 0, -1), updir=(0, 1, 0))
    assert np.allclose(g.rays[1, 1], [0, 0, -1])


def test_conecirc():
    g = ConeCircGeom((4, 8), pos=(0, 0, 4.0), fov=(10, 40))
    assert g.shape == (4, 8)
    assert np.allclose(np.linalg.norm(g.rays, axis=-1), 1)
    # inner/outer ring angles match the fov annulus
    ang = np.degrees(np.arccos(np.clip(g.rays @ g.lookdir, -1, 1)))
    assert np.allclose(ang[0], 5, atol=1e-6)
    assert np.allclose(ang[-1], 20, atol=1e-6)


def test_conecirc_log_spacing():
    g = ConeCircGeom((4, 8), pos=(0, 0, 4.0), fov=(10, 40), spacing="log")
    ratios = g.r[1:] / g.r[:-1]
    assert np.allclose(ratios, ratios[0])
    with pytest.raises(ValueError):
        ConeCircGeom((4, 8), pos=(0, 0, 4.0), fov=(0, 40), spacing="log")


def test_parallel():
    g = ParallelGeom((5, 3), pos=(2.0, 0, 0), size=(1.0, 0.5))
    assert g.rays.shape == (1, 1, 3)
    assert np.allclose(g.rays[0, 0], [-1, 0, 0])
    starts = g.ray_starts
    assert starts.shape == (5, 3, 3)
    # pixel pitch
    pitch_u = np.linalg.norm(starts[1, 0] - starts[0, 0])
    pitch_v = np.linalg.norm(starts[0, 1] - starts[0, 0])
    assert np.isclose(pitch_u, 1.0 / 4)
    assert np.isclose(pitch_v, 0.5 / 2)
    # detector plane is orthogonal to the beam
    assert np.allclose((starts - starts[0, 0]) @ np.asarray(g.rays[0, 0]), 0)


def test_collection_add():
    a = ConeRectGeom((4, 4), pos=(2.0, 0, 0))
    b = ConeRectGeom((4, 4), pos=(0, 2.0, 0))
    c = ConeRectGeom((4, 4), pos=(0, 0, 2.0))
    col = a + b
    assert isinstance(col, ViewGeomCollection)
    assert col.shape == (2, 4, 4)
    assert len(col) == 2
    # non-mutating add (fixes reference bug geometry.py:368-374)
    col2 = col + c
    assert len(col) == 2 and len(col2) == 3
    # sum() entry point (reference usage examples/static_retrieval.py:39)
    col3 = sum([a, b, c])
    assert isinstance(col3, ViewGeomCollection) and len(col3) == 3
    assert col3.rays.shape == (3, 4, 4, 3)
    assert col3.ray_starts.shape == (3, 1, 1, 3)
    assert col3.pos.shape == (3, 3)
    assert col3[1] is b


def test_collection_shape_mismatch():
    a = ConeRectGeom((4, 4), pos=(2.0, 0, 0))
    b = ConeRectGeom((4, 5), pos=(0, 2.0, 0))
    with pytest.raises(ValueError):
        _ = a + b


def test_wireframes_exist():
    geoms = [
        ConeRectGeom((4, 4), pos=(2.0, 0, 0)),
        ConeCircGeom((4, 4), pos=(0, 0, 4.0), fov=(10, 40)),
        ParallelGeom((4, 4), pos=(2.0, 0, 0)),
    ]
    col = sum(geoms)
    for g in geoms + [col]:
        wf = g._wireframe
        assert len(wf) >= 1
