"""In-kernel fused engine (ops/fused_pallas.py) vs the XLA oracle.

The trace — intersections, bitonic sort, midpoint labels — runs inside
the Pallas kernel (interpret mode here); forward images and VJP
gradients must match the precomputed path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import (
    ConeRectGeom,
    Operator,
    SphericalGrid,
    TraceConfig,
)
from sph_raytracer_tpu.ops.fused_pallas import (
    fused_pallas_project,
    supported,
)
from sph_raytracer_tpu.ops.trace import GridSpec


def _geo(geom):
    xs = jnp.asarray(
        np.broadcast_to(geom.ray_starts, (*geom.shape, 3)), jnp.float32)
    return xs, jnp.asarray(geom.rays, jnp.float32)


CASES = [
    # (grid kwargs, detector builder)
    (dict(shape=(8, 9, 10), size_r=(0.3, 1.0)),
     lambda: sum(ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t),
                                           0.4), fov=(45, 45))
                 for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))),
    # log radial spacing + interior-start rays (start inside the grid)
    (dict(shape=(7, 6, 9), size_r=(0.1, 1.0), spacing="log"),
     lambda: ConeRectGeom((5, 6), pos=(0.5, 0.1, 0.2),
                          lookdir=(1.0, 0.3, -0.1), fov=(60, 60))),
    # partial grid (no full-azimuth wrap), parallel-ish rays
    (dict(r_b=np.linspace(0.0, 1.0, 7), e_b=np.linspace(0.4, 2.7, 7),
          a_b=np.linspace(-2.0, 2.4, 8)),
     lambda: ConeRectGeom((6, 6), pos=(1.8, -0.4, 0.3), fov=(35, 35))),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_fused_pallas_matches_oracle(case):
    gkw, mk = CASES[case]
    grid = SphericalGrid(**gkw)
    geom = mk()
    gs = GridSpec.from_grid(grid, ftype=jnp.float32)
    V = int(np.prod(grid.vshape))
    assert supported(gs, V)
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(case).random(V), jnp.float32)
    xs, rays = _geo(geom)
    y = fused_pallas_project(gs, x, xs, rays, jnp.int32, True)
    ref = np.asarray(op(x.reshape(grid.vshape))).reshape(y.shape)
    assert np.allclose(np.asarray(y), ref, atol=2e-5, rtol=1e-4), \
        np.abs(np.asarray(y) - ref).max()

    g = jax.grad(lambda v: jnp.sum(
        fused_pallas_project(gs, v, xs, rays, jnp.int32, True) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(op(v.reshape(grid.vshape)) ** 2))(x)
    assert np.allclose(np.asarray(g), np.asarray(gr), atol=1e-4,
                       rtol=1e-3), np.abs(np.asarray(g)
                                          - np.asarray(gr)).max()


def test_fused_pallas_operator_mode():
    """Operator(mode='fused', fused_backend='pallas') end to end,
    including channel batching."""
    grid = SphericalGrid(shape=(8, 9, 10), size_r=(0.3, 1.0))
    geom = sum(ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t),
                                         0.4), fov=(45, 45))
               for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    cfg = TraceConfig(mode="fused", fused_backend="pallas",
                      interpret=True)
    fop = Operator(grid, geom, config=cfg)
    assert fop._fused_pallas()
    ref = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).random(tuple(grid.shape)), jnp.float32)
    assert np.allclose(np.asarray(fop(x)), np.asarray(ref(x)), atol=2e-5)
    xc = jnp.stack([x, 2 * x])
    assert np.allclose(np.asarray(fop(xc)), np.asarray(ref(xc)),
                       atol=4e-5)


def test_fused_pallas_dynamic_offsets():
    """Binned 4D volumes via per-ray view offsets.

    View angles are offset from the π/3-spaced azimuth boundaries: a
    midpoint EXACTLY on a boundary plane may label to either adjacent
    voxel (equal-length knife edge; the fused kernel's half-plane sign
    test and the XLA path's atan2+searchsorted round differently there —
    see ops/fused_pallas.py docstring)."""
    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6), size_r=(0.3, 1.0))
    geom = sum(ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t),
                                         0.3), fov=(45, 45))
               for t in np.linspace(0.15, np.pi + 0.15, T,
                                    endpoint=False))
    cfg = TraceConfig(mode="fused", fused_backend="pallas",
                      interpret=True)
    fop = Operator(grid, geom, config=cfg)
    ref = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).random(tuple(grid.shape)), jnp.float32)
    assert np.allclose(np.asarray(fop(x)), np.asarray(ref(x)), atol=2e-5)


def test_fused_pallas_sharded():
    """ShardedOperator(mode='fused', fused_backend='pallas') runs the
    in-kernel engine per shard under shard_map (8-device CPU mesh),
    with the psum'd gradient matching the single-device oracle."""
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    grid = SphericalGrid(shape=(8, 9, 10), size_r=(0.3, 1.0))
    geom = sum(ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t),
                                         0.4), fov=(45, 45))
               for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    cfg = TraceConfig(mode="fused", fused_backend="pallas",
                      interpret=True)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._fused_pallas_sharded()
    ref = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(2).random(tuple(grid.shape)), jnp.float32)
    assert np.allclose(np.asarray(sop(x)), np.asarray(ref(x)), atol=2e-5)
    y = ref(x)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x)
    g_ref = jax.grad(lambda d: jnp.mean((ref(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-5)


def test_fused_pallas_envelope():
    """100³ (BASELINE config #5 scale) is inside the envelope via the
    streamed-window sweep; M > 512 and f64 are refused and auto-fall
    back."""
    from sph_raytracer_tpu.ops.fused_pallas import _needs_dynamic

    big = SphericalGrid(shape=(100, 100, 100))
    gs = GridSpec.from_grid(big, ftype=jnp.float32)
    assert supported(gs, 10 ** 6)
    assert _needs_dynamic(7816, 512)

    huge = GridSpec.from_grid(SphericalGrid(shape=(128, 128, 128)),
                              ftype=jnp.float32)  # Mp = 1024 > 512
    assert not supported(huge, 128 ** 3)
    geom = ConeRectGeom((4, 4), pos=(2.0, 0.1, 0.2), fov=(30, 30))
    with pytest.raises(ValueError, match="envelope"):
        Operator(SphericalGrid(shape=(128, 128, 128)), geom,
                 config=TraceConfig(mode="fused", fused_backend="pallas",
                                    interpret=True))(
            jnp.zeros((128, 128, 128), jnp.float32))
    f64 = GridSpec.from_grid(SphericalGrid(shape=(8, 8, 8)),
                             ftype=jnp.float64)
    assert not supported(f64, 512)


def test_fused_pallas_dynamic_sweep(monkeypatch):
    """The streamed-window (DMA fori_loop) sweep matches the unrolled
    one — forced on a small grid via _needs_dynamic."""
    import sph_raytracer_tpu.ops.fused_pallas as fp

    grid = SphericalGrid(shape=(8, 9, 10), size_r=(0.3, 1.0))
    geom = sum(ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t),
                                         0.4), fov=(45, 45))
               for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    gs = GridSpec.from_grid(grid, ftype=jnp.float32)
    V = int(np.prod(grid.vshape))
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(5).random(V), jnp.float32)
    xs, rays = _geo(geom)
    monkeypatch.setattr(fp, "_needs_dynamic",
                        lambda H, Mp, nstreams=1: True)
    fp._fused_pallas_call.clear_cache()
    try:
        y = fp.fused_pallas_project(gs, x, xs, rays, jnp.int32, True)
        ref = np.asarray(op(x.reshape(grid.vshape))).reshape(y.shape)
        assert np.allclose(np.asarray(y), ref, atol=2e-5), \
            np.abs(np.asarray(y) - ref).max()
    finally:
        fp._fused_pallas_call.clear_cache()


def test_fused_routed_bwd_hybrid():
    """fused_bwd='routed' (round 4): zero-table fused forward + banded
    routed backward.  Forward equals plain fused; gradient and adjoint
    equal the precomputed oracle."""
    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", routed_g=128,
                      routed_chunk_multiple=2)
    op_h = Operator(grid, geom, config=cfg.replace(fused_bwd="routed"))
    assert op_h._fused_btd is not None
    op_f = Operator(grid, geom, config=cfg)
    op_p = Operator(grid, geom, ftype=jnp.float32)
    yh = np.asarray(op_h(x))
    assert np.array_equal(yh, np.asarray(op_f(x)))  # same fwd kernel
    y0 = jnp.asarray(np.asarray(op_p(x)))
    gh = np.asarray(jax.grad(
        lambda d: jnp.mean((op_h(d) - y0) ** 2))(x))
    gp = np.asarray(jax.grad(
        lambda d: jnp.mean((op_p(d) - y0) ** 2))(x))
    assert np.allclose(gh, gp, atol=1e-5), np.abs(gh - gp).max()
    # adjoint now rides the banded kernel too (no lin/lens build)
    bt = np.asarray(op_h.T(y0))
    bp = np.asarray(op_p.T(y0))
    assert np.allclose(bt, bp, atol=1e-4), np.abs(bt - bp).max()
    # payload threading (what gd does)
    pl = op_h.payload
    assert "fbtd" in pl

    @jax.jit
    def step(d, pl):
        fx = op_h.with_payload(pl)
        return jax.grad(lambda v: jnp.mean((fx(v) - y0) ** 2))(d)

    assert np.allclose(np.asarray(step(x, pl)), gp, atol=1e-5)


def test_fused_routed_bwd_hybrid_view_times():
    """fused_bwd='routed' with time-interpolated 4D: the fused forward
    lerps in-kernel while the backward tables carry the lerp-doubled
    crossings — grads must match the precomputed oracle."""
    T = 3
    grid = SphericalGrid(shape=(T, 8, 6, 6), size_t=(0.0, 10.0))
    geom = sum(
        ConeRectGeom((5, 6), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, 4, endpoint=False))
    times = np.array([0.0, 3.3, 6.7, 10.0])
    x = jnp.asarray(np.random.default_rng(2).random(tuple(grid.shape)),
                    jnp.float32)
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", fused_bwd="routed",
                      routed_g=128, routed_chunk_multiple=2)
    op_h = Operator(grid, geom, config=cfg, view_times=times)
    assert op_h._fused_btd is not None and op_h._time_w is not None
    op_p = Operator(grid, geom, ftype=jnp.float32, view_times=times)
    y0 = jnp.asarray(np.asarray(op_p(x)))
    yh = np.asarray(op_h(x))
    assert np.allclose(yh, np.asarray(y0), atol=5e-3), \
        np.abs(yh - np.asarray(y0)).max()
    gh = np.asarray(jax.grad(
        lambda d: jnp.mean((op_h(d) - y0) ** 2))(x))
    gp = np.asarray(jax.grad(
        lambda d: jnp.mean((op_p(d) - y0) ** 2))(x))
    assert np.allclose(gh, gp, atol=1e-5), np.abs(gh - gp).max()


def test_fused_bwd_auto_lazy():
    """fused_bwd='auto' (round 5, VERDICT r4 #4): resolves to 'routed'
    whenever the Pallas fused engine is active, but the banded backward
    build is DEFERRED — construction and pure forward projections stay
    zero-table (the fused promise); the first gradient, payload access,
    or T() call triggers the bwd-only build, and the gradient matches
    the precomputed oracle."""
    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", routed_g=128,
                      routed_chunk_multiple=2)  # fused_bwd left at 'auto'
    op = Operator(grid, geom, config=cfg)
    assert op._fused_bwd == "routed" and op._fused_bwd_lazy
    assert op._fused_btd is None  # zero tables at construction
    y = op(x)
    assert op._fused_btd is None  # ...and after a forward-only call
    op_p = Operator(grid, geom, ftype=jnp.float32)
    y0 = jnp.asarray(np.asarray(op_p(x)))
    assert np.allclose(np.asarray(y), np.asarray(y0), atol=2e-5)
    # first gradient triggers the bwd-only banded build via custom VJP
    gh = np.asarray(jax.grad(lambda d: jnp.mean((op(d) - y0) ** 2))(x))
    assert op._fused_btd is not None
    gp = np.asarray(jax.grad(lambda d: jnp.mean((op_p(d) - y0) ** 2))(x))
    assert np.allclose(gh, gp, atol=1e-5), np.abs(gh - gp).max()
    # payload carries the built tables (the gd()/solver threading path)
    assert "fbtd" in op.payload
    # T() rides the banded adjoint, not a lin/lens materialization
    op2 = Operator(grid, geom, config=cfg)
    assert op2._fused_btd is None
    bt = np.asarray(op2.T(y0))
    assert op2._fused_btd is not None and op2.lin is None
    assert np.allclose(bt, np.asarray(op_p.T(y0)), atol=1e-4)
    # outside the Pallas engine (CPU backend, no interpret) auto keeps
    # the zero-residual retrace
    op_cpu = Operator(grid, geom, mode="fused")
    assert op_cpu._fused_bwd == "retrace" and not op_cpu._fused_bwd_lazy


def test_fused_auto_payload_cross_instance():
    """with_payload carrying an 'fbtd' payload onto a SECOND operator
    that never built its hybrid (checkpoint/restart, rebuild-per-stage)
    must materialize the receiving instance's kernel closures and run
    the threaded tables — round-5 review fix; previously
    AttributeError on _fused_hybrid_proj/_fused_adj."""
    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    x = jnp.asarray(np.random.default_rng(7).random(tuple(grid.shape)),
                    jnp.float32)
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", routed_g=128,
                      routed_chunk_multiple=2)
    op1 = Operator(grid, geom, config=cfg)
    pl = op1.payload  # triggers the lazy bwd-only build on op1
    assert "fbtd" in pl
    op2 = Operator(grid, geom, config=cfg)
    assert op2._fused_btd is None
    y2 = np.asarray(op2.with_payload(pl)(x))
    # same zero-table fused forward kernel either way
    assert np.array_equal(y2, np.asarray(op1(x)))
    # adjoint + gradient flow through the THREADED tables (deterministic
    # build => byte-identical to op2's own, so bitwise against op1)
    bt = np.asarray(op2.with_payload(pl).T(jnp.asarray(y2)))
    assert np.array_equal(bt, np.asarray(op1.T(jnp.asarray(y2))))
    g2 = np.asarray(jax.grad(
        lambda d: jnp.mean(op2.with_payload(pl)(d) ** 2))(x))
    g1 = np.asarray(jax.grad(
        lambda d: jnp.mean(op1.with_payload(pl)(d) ** 2))(x))
    assert np.array_equal(g2, g1)


def test_fused_auto_staged_constants_warns():
    """fused_bwd='auto' gradient taken inside a jit WITHOUT payload
    threading bakes the banded tables into the trace as constants
    (CLAUDE.md relay landmine) — the lazy VJP rule must warn; a plain
    eager gradient (no staging, nothing baked) must not."""
    import warnings as _w

    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    x = jnp.asarray(np.random.default_rng(8).random(tuple(grid.shape)),
                    jnp.float32)
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", routed_g=128,
                      routed_chunk_multiple=2)
    op = Operator(grid, geom, config=cfg)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        jax.grad(lambda d: jnp.mean(op(d) ** 2))(x)  # eager: no warning
    op_j = Operator(grid, geom, config=cfg)
    with pytest.warns(UserWarning, match="CONSTANTS"):
        jax.jit(jax.grad(lambda d: jnp.mean(op_j(d) ** 2)))(x)


def test_channel_batching_one_dispatch():
    """Round 5 (VERDICT r4 #3): multi-channel __call__ / T() run as ONE
    compiled lax.scan dispatch instead of a Python loop of kernel
    launches.  Routed engine: bitwise equal to the looped path (all math
    inside pallas_call).  Fused interpret engine: the forward's jnp ops
    refuse differently under scan on CPU (~4e-6); on real TPU the fused
    forward is a single Pallas kernel too.  Grads through the scan match
    per-channel grads."""
    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    C = 4
    x = np.random.default_rng(7).random((C, *grid.shape)).astype(np.float32)
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    opr = Operator(grid, geom, config=cfg)
    yb = np.asarray(opr(x))
    yl = np.stack([np.asarray(opr(x[i])) for i in range(C)])
    assert np.array_equal(yb, yl)  # routed: bitwise
    tb = np.asarray(opr.T(yb))
    tl = np.stack([np.asarray(opr.T(yb[i])) for i in range(C)])
    assert np.array_equal(tb, tl)
    y0 = jnp.asarray(yb)
    gs = np.asarray(jax.grad(
        lambda d: jnp.sum((opr(d) - y0) ** 2))(jnp.asarray(x)))
    gl = np.stack([np.asarray(jax.grad(
        lambda d: jnp.sum((opr(d) - y0[i]) ** 2))(jnp.asarray(x[i])))
        for i in range(C)])
    assert np.array_equal(gs, gl)

    cfgf = TraceConfig(mode="fused", interpret=True,
                       fused_backend="pallas", routed_g=128,
                       routed_chunk_multiple=2)
    opf = Operator(grid, geom, config=cfgf)
    yfb = np.asarray(opf(x))
    yfl = np.stack([np.asarray(opf(x[i])) for i in range(C)])
    assert np.allclose(yfb, yfl, atol=1e-5), np.abs(yfb - yfl).max()
    gsf = np.asarray(jax.grad(
        lambda d: jnp.sum((opf(d) - y0) ** 2))(jnp.asarray(x)))
    glf = np.stack([np.asarray(jax.grad(
        lambda d: jnp.sum((opf(d) - y0[i]) ** 2))(jnp.asarray(x[i])))
        for i in range(C)])
    assert np.allclose(gsf, glf, atol=2e-4), np.abs(gsf - glf).max()
    # the fused adjoint (banded bwd kernel) IS bitwise under scan
    tfb = np.asarray(opf.T(yfb))
    tfl = np.stack([np.asarray(opf.T(yfb[i])) for i in range(C)])
    assert np.array_equal(tfb, tfl)
