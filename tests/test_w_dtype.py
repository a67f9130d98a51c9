"""bf16 weight tables (config.routed_w_dtype): the banded engine's only
non-int8 per-slot tables (w fwd, wp bwd) quantize to bfloat16 — ~19%
fewer table bytes per pass at KD=2.  Both passes quantize the SAME
segment lengths, so the operator remains EXACTLY self-adjoint on the
perturbed weights; outputs move by the ~0.2-0.4% weight quantization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig

G, CM = 128, 2


@pytest.fixture(scope="module")
def setup():
    # big enough that every superchunk height is a 16-row multiple even
    # under dense slots (dense fwd SRB = H = 64 rows; dense bwd SRB =
    # 8·T = 16)
    grid = SphericalGrid(shape=(32, 16, 16))
    geom = sum(
        ConeRectGeom((8, 10), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    return grid, geom, x


@pytest.mark.parametrize("dense", ["off", "both"])
def test_bf16_weights_parity_and_adjoint(setup, dense):
    grid, geom, x = setup
    base = TraceConfig(mode="routed", interpret=True, routed_g=G,
                       routed_chunk_multiple=CM, routed_dense=dense)
    op32 = Operator(grid, geom, config=base)
    op16 = Operator(grid, geom,
                    config=base.replace(routed_w_dtype="bf16"))
    ft = op16._dt[0]
    assert ft.w.dtype == jnp.bfloat16
    y32 = np.asarray(op32(x))
    y16 = np.asarray(op16(x))
    # quantized weights: ~2^-9 relative on each segment length
    assert np.allclose(y16, y32, rtol=2e-2, atol=1e-2 * abs(y32).max())
    assert not np.array_equal(y16, y32)  # it IS a different operator
    # ... but an exactly self-adjoint one
    yy = jnp.asarray(y16)
    lhs = float(jnp.vdot(op16(x), yy))
    rhs = float(jnp.vdot(x, op16.T(yy)))
    assert np.isclose(lhs, rhs, rtol=1e-4)
    # gradient consistent with ITS OWN forward (custom VJP transpose)
    g16 = jax.grad(lambda d: jnp.mean((op16(d) - yy) ** 2))(x)
    g32 = jax.grad(lambda d: jnp.mean((op32(d) - jnp.asarray(y32)) ** 2))(x)
    assert np.allclose(np.asarray(g16), np.asarray(g32), rtol=5e-2,
                       atol=1e-2 * np.abs(np.asarray(g32)).max())


def test_bf16_weights_device_build(setup):
    grid, geom, x = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_build="device",
                      routed_w_dtype="bf16")
    op = Operator(grid, geom, config=cfg)
    assert op._dt[0].w.dtype == jnp.bfloat16
    assert op._dt[1].wp.dtype == jnp.bfloat16
    y32 = np.asarray(Operator(grid, geom, mode="precomputed",
                              ftype=jnp.float32)(x))
    assert np.allclose(np.asarray(op(x)), y32, rtol=2e-2,
                       atol=1e-2 * abs(y32).max())


def test_bf16_weights_sharded(setup):
    """ShardedOperator's banded builds honor routed_w_dtype too."""
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    grid, geom, x = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_w_dtype="bf16")
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._sb_ft["w"].dtype == jnp.bfloat16
    assert sop._sb_bt["wp"].dtype == jnp.bfloat16
    y32 = np.asarray(Operator(grid, geom, mode="precomputed",
                              ftype=jnp.float32)(x))
    ys = np.asarray(sop(x))
    assert np.allclose(ys, y32, rtol=2e-2, atol=1e-2 * abs(y32).max())
    yy = jnp.asarray(ys)
    g = jax.grad(lambda d: jnp.mean((sop(d) - yy) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_weights_tiling_fallback():
    """Superchunk heights not divisible by 16 keep f32 (with a warning)."""
    import warnings

    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((4, 4), (3.0, 0.0, 0.3), fov=(30, 30))
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=1, routed_bands=1,
                      routed_dense="off", routed_w_dtype="bf16")
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        op = Operator(grid, geom, config=cfg)
    assert op._dt[0].w.dtype == jnp.float32
    assert any("16-row" in str(w.message) for w in wlist)


def test_w_dtype_rejects_unknown():
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((4, 4), (3.0, 0.0, 0.3), fov=(30, 30))
    with pytest.raises(ValueError):
        Operator(grid, geom,
                 config=TraceConfig(mode="routed", interpret=True,
                                    routed_w_dtype="fp8"))


def test_bf16_warns_on_non_banded_path():
    """routed_w_dtype='bf16' only exists in the banded engine; other
    modes must warn instead of silently keeping f32 (ADVICE r3)."""
    grid = SphericalGrid(shape=(4, 4, 4))
    geom = ConeRectGeom((4, 4), pos=(2, 0, 0.3), fov=(40, 40))
    with pytest.warns(UserWarning, match="BANDED routed engine"):
        Operator(grid, geom, config=TraceConfig(
            mode="precomputed", routed_w_dtype="bf16"))
    with pytest.warns(UserWarning, match="BANDED routed engine"):
        Operator(grid, geom, config=TraceConfig(
            mode="routed", interpret=True, routed_banded=False,
            routed_w_dtype="bf16"))
