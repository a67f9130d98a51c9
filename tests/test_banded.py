"""Band-compacted routed engine: interpret-mode kernels vs the XLA table
oracle (band_pack groups live 8-row density bands into superchunks; see
ops/route.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, SphericalGrid
from sph_raytracer_tpu.ops import routed_project as rp
from sph_raytracer_tpu.ops.project import (
    backproject_table,
    precompute_table,
    project_table,
)
from sph_raytracer_tpu.ops.route import band_pack, build_routed_tables
from sph_raytracer_tpu.ops.trace import GridSpec

F32 = jnp.float32


# (G, KD, B, SR): the G=1024 case has HI=8 so the grouped8 backward
# g-fetch runs (it falls back to the select tree at HI<8), and SR=16/32
# exercise taller-than-8-row bands
@pytest.fixture(scope="module",
                params=[(256, 3, 4, 8), (128, 2, 8, 8), (1024, 2, 4, 16),
                        (256, 2, 2, 32)])
def setup(request):
    G, KD, B, SR = request.param
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((8, 10), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    gs = GridSpec.from_grid(grid, ftype=F32)
    lin, lens, n, _ = precompute_table(
        gs, np.asarray(geom.ray_starts, np.float32),
        np.asarray(geom.rays, np.float32), block=256, itype=jnp.int32)
    lin, lens = np.asarray(lin[:n]), np.asarray(lens[:n])
    V = 8 * 8 * 8
    rt8 = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD)
    btF = band_pack(rt8, B=B, by="tile", chunk_multiple=4)
    btB = band_pack(rt8, B=B, by="window", chunk_multiple=4)
    ft, meta = rp.banded_device_fwd(btF)
    btd, metab = rp.banded_device_bwd(btB)
    return dict(lin=lin, lens=lens, V=V, B=B, btF=btF, btB=btB, ft=ft,
                btd=btd, meta=meta, metab=metab, n=n)


def test_banded_forward_matches_oracle(setup):
    s = setup
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.random(s["V"]), F32)
    d2 = s["btF"].pad_density(flat)
    y = rp._fwd_banded_pallas(d2, s["ft"], s["meta"], s["B"], interpret=True)
    got = np.asarray(y).reshape(-1)[: s["n"]]
    want = np.asarray(project_table(
        flat, jnp.asarray(s["lin"]), jnp.asarray(s["lens"])))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_banded_backward_is_transpose(setup):
    s = setup
    rng = np.random.default_rng(1)
    meta = s["meta"]
    yf = jnp.asarray(rng.random(s["n"]), F32)
    pad = meta.T * meta.G - s["n"]
    yt = jnp.concatenate([yf, jnp.zeros((pad,), F32)]).reshape(
        meta.T, meta.HI, 128)
    d2 = rp._bwd_banded_pallas(yt, s["btd"], s["metab"], s["B"],
                               interpret=True)
    got = np.asarray(s["btF"].unpad_density(d2))
    want = np.asarray(backproject_table(
        yf, jnp.asarray(s["lin"]), jnp.asarray(s["lens"]),
        volume_size=s["V"]))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_banded_custom_vjp(setup):
    s = setup
    rng = np.random.default_rng(2)
    flat = jnp.asarray(rng.random(s["V"]), F32)
    y0 = jnp.asarray(rng.random(s["n"]), F32)

    lin_j, lens_j = jnp.asarray(s["lin"]), jnp.asarray(s["lens"])

    def loss_oracle(f):
        return jnp.mean((project_table(f, lin_j, lens_j) - y0) ** 2)

    meta, B = s["meta"], s["B"]
    ga = np.asarray(jax.grad(loss_oracle)(flat))
    # the VJP pipeline by hand: cotangent dy = 2(y - y0)/n applied through
    # the banded bwd kernel must equal the oracle's autodiff gradient
    d2 = s["btF"].pad_density(flat)
    y = rp._fwd_banded_pallas(d2, s["ft"], meta, B, interpret=True)
    dy = 2.0 * (y.reshape(-1)[: s["n"]] - y0) / s["n"]
    pad = meta.T * meta.G - s["n"]
    dyt = jnp.concatenate([dy, jnp.zeros((pad,), F32)]).reshape(
        meta.T, meta.HI, 128)
    gb2 = s["btF"].unpad_density(
        rp._bwd_banded_pallas(dyt, s["btd"], s["metab"], B, interpret=True))
    assert np.allclose(np.asarray(gb2), ga, atol=1e-5), \
        np.abs(np.asarray(gb2) - ga).max()


def test_banded_operator_interpret_end_to_end():
    """Full Operator banded path on CPU (interpret kernels) vs the XLA
    precomputed operator — with unequal fwd/bwd superchunk counts (the
    backward grouping runs on its own meta)."""
    from sph_raytracer_tpu import Operator
    from sph_raytracer_tpu.config import TraceConfig

    grid = SphericalGrid(shape=(32, 16, 16))
    geom = sum(
        ConeRectGeom((8, 10), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    op_b = Operator(grid, geom, config=cfg)
    assert isinstance(op_b._dt, tuple)  # banded engine active
    assert op_b._rmeta.NC != op_b._rmeta_bwd.NC  # distinct groupings
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_b(x)), np.asarray(op_a(x)), atol=1e-4)
    y = op_a(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    gb = jax.grad(lambda d: jnp.mean((op_b(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(gb), np.asarray(ga), atol=1e-5)
    assert np.allclose(np.asarray(op_b.T(y)), np.asarray(op_a.T(y)),
                       atol=1e-4)


def test_banded_operator_dynamic_interpret():
    """4D dynamic volumes through the banded engine (per-view time
    offsets fold into the flat density index)."""
    from sph_raytracer_tpu import Operator
    from sph_raytracer_tpu.config import TraceConfig

    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, T, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    op_b = Operator(grid, geom, config=cfg)
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(1).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_b(x)), np.asarray(op_a(x)), atol=1e-4)
    # 4D adjoint (the reference raises NotImplementedError here)
    y = op_a(x)
    assert np.allclose(np.asarray(op_b.T(y)), np.asarray(op_a.T(y)),
                       atol=1e-4)


def test_banded_retrieval_gd():
    """gd() threads the banded operator's (ft, btd) payload through its
    jitted scan chunks."""
    from sph_raytracer_tpu import Operator
    from sph_raytracer_tpu.config import TraceConfig
    from sph_raytracer_tpu.loss import SquareLoss
    from sph_raytracer_tpu.models import FullyDenseModel
    from sph_raytracer_tpu.retrieval import gd

    grid = SphericalGrid(shape=(6, 6, 6))
    geom = sum(
        ConeRectGeom((6, 6), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    op = Operator(grid, geom, config=cfg)
    truth = jnp.asarray(np.random.default_rng(3).random(tuple(grid.shape)),
                        jnp.float32)
    y = op(truth)
    coeffs, reproj, losses = gd(op, y, FullyDenseModel(grid),
                                loss_fns=[SquareLoss()],
                                num_iterations=12, learning_rate=0.2,
                                progress_bar=False)
    hist = losses[list(losses)[0]]
    assert hist[-1] < hist[0] * 0.5  # converging
