"""Pallas <-> XLA parity sweep + golden-image regression.

Randomized scenes (near-plane crossers, degenerates, batches, range
mode, peeling) at sizes that cross the kernel's tile boundaries
(64-row bands, 1024-col tiles, multi-chunk record streams), checking:

* fused rasterizer (interpret) == XLA path: bit-identical ID buffers,
  float-tolerance barys/derivatives;
* the scalar-prefetch remap chunk path == the dense chunk path (the
  remap engages only when nc > 1, i.e. enough subtriangle chunks);
* committed golden renders of the sample workloads (tests/golden/*.npz)
  to catch any regression in the full 4-op pipeline.

Regenerate goldens: python tests/test_parity_sweep.py --regen
"""

import os
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nvdiffrast_tpu as dr
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _random_scene(seed, B=1, V=64, T=48, near_crossers=True,
                  degenerates=True):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, (B, V, 4)).astype(np.float32)
    pos[..., 3] = rng.uniform(0.4, 2.5, (B, V))
    if near_crossers:
        k = max(2, V // 10)
        pos[:, :k, 3] = rng.uniform(-0.5, 0.1, (B, k))
    tri = rng.randint(0, V, (T, 3)).astype(np.int32)
    if degenerates:
        tri[0] = [3, 3, 7]       # repeated vertex
        tri[1] = [5, 5, 5]       # fully degenerate
    return jnp.asarray(pos), jnp.asarray(tri)


def _assert_ids_match_mod_zfights(r_x, r_p, max_frac=2e-4):
    """ID buffers equal except where two triangles genuinely intersect
    (equal depths to float tolerance): there the winner is a true tie
    and the two paths' different merge orders may round differently.
    Non-tied pixels must agree exactly."""
    ix = np.asarray(r_x[..., 3])
    ip = np.asarray(r_p[..., 3])
    differ = ix != ip
    if differ.any():
        zx = np.asarray(r_x[..., 2])[differ]
        zp = np.asarray(r_p[..., 2])[differ]
        np.testing.assert_allclose(zx, zp, atol=1e-4, err_msg=(
            "ID mismatch at non-tied depth — real coverage divergence"))
        assert differ.mean() <= max_frac, (
            f"{differ.sum()} id mismatches — too many even for z-fights")
    return ~differ


@pytest.mark.parametrize("seed,res,B", [
    (0, (96, 1152), 1),   # crosses the 1024-col tile split
    (1, (67, 130), 2),    # odd sizes, batch
    (2, (130, 96), 1),    # >2 rowbands
    (3, (48, 64), 3),     # batch of 3
])
def test_rasterize_parity_sweep(seed, res, B):
    pos, tri = _random_scene(seed, B=B)
    r_x, db_x = dr.rasterize(None, pos, tri, res, impl="xla")
    r_p, db_p = dr.rasterize(None, pos, tri, res, impl="pallas_interpret")
    same = _assert_ids_match_mod_zfights(r_x, r_p)
    # Adversarial random geometry (near-plane crossers -> huge screen
    # extents) stresses bary precision; coverage is the bitwise part.
    np.testing.assert_allclose(np.asarray(r_x)[same], np.asarray(r_p)[same],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_x)[same],
                               np.asarray(db_p)[same], atol=1e-3)


def test_rasterize_parity_many_tris():
    """Multi-chunk record stream (S > chunk) with remap engaged, plus a
    comparison against the big-mesh CSR segment path (forced by
    shrinking the remap SMEM budget)."""
    from nvdiffrast_tpu.ops import rasterize_pallas as rp

    pos_idx, vtxp, _, _ = primitives.uv_sphere(24, 48)  # ~2.2k tris
    tri = jnp.asarray(pos_idx)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.2)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))

    res = (96, 128)
    r_x, _ = dr.rasterize(None, pos, tri, res, impl="xla")
    r_p, _ = dr.rasterize(None, pos, tri, res, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(r_x[..., 3]),
                                  np.asarray(r_p[..., 3]))

    # Force the CSR path by shrinking the remap SMEM budget. The CSR
    # sweep visits records in a different order (per-tile segments),
    # so only genuine z-fights may differ.
    orig = rp._REMAP_MAX_ENTRIES
    try:
        rp._REMAP_MAX_ENTRIES = 0
        r_c, db_c = dr.rasterize(None, pos, tri, res,
                                 impl="pallas_interpret")
    finally:
        rp._REMAP_MAX_ENTRIES = orig
    same = _assert_ids_match_mod_zfights(r_p, r_c)
    np.testing.assert_allclose(np.asarray(r_p)[same], np.asarray(r_c)[same],
                               atol=1e-6)


def test_rasterize_csr_batch():
    """CSR path with a minibatch (vmapped layout + per-image scalar
    tables) must match the remap path mod z-fights."""
    from nvdiffrast_tpu.ops import rasterize_pallas as rp

    pos, tri = _random_scene(11, B=2, T=400)
    res = (96, 128)
    r_p, _ = dr.rasterize(None, pos, tri, res, impl="pallas_interpret")
    orig = rp._REMAP_MAX_ENTRIES
    try:
        rp._REMAP_MAX_ENTRIES = 0
        r_c, _ = dr.rasterize(None, pos, tri, res, impl="pallas_interpret")
    finally:
        rp._REMAP_MAX_ENTRIES = orig
    _assert_ids_match_mod_zfights(r_p, r_c)


def test_peeling_parity_random():
    # Triangles on distinct z planes (w = 1): plenty of overlap in
    # screen space for peeling, but no 3-D intersections, so no
    # genuine depth ties and layer contents must match exactly.
    rng = np.random.RandomState(7)
    B, T = 2, 30
    tri_np = np.arange(3 * T, dtype=np.int32).reshape(T, 3)
    pos_np = rng.uniform(-1, 1, (B, 3 * T, 4)).astype(np.float32)
    pos_np[..., 3] = 1.0
    z_planes = np.linspace(-0.8, 0.8, T).astype(np.float32)
    for t in range(T):
        pos_np[:, 3 * t:3 * t + 3, 2] = z_planes[t]
    pos, tri = jnp.asarray(pos_np), jnp.asarray(tri_np)
    outs = {}
    for impl in ("xla", "pallas_interpret"):
        with dr.DepthPeeler(dr.RasterizeCudaContext(), pos, tri, (67, 96),
                            impl=impl) as peeler:
            layers = [np.asarray(peeler.rasterize_next_layer()[0])
                      for _ in range(3)]
        outs[impl] = layers
    for a, b in zip(outs["xla"], outs["pallas_interpret"]):
        np.testing.assert_array_equal(a[..., 3], b[..., 3])
        np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# Golden renders of the sample workloads.
# ---------------------------------------------------------------------------

def _workload_images():
    """Deterministic small renders of the five sample workloads."""
    out = {}

    # triangle
    pos = jnp.asarray([[[-0.8, -0.8, 0, 1], [0.8, -0.8, 0, 1],
                        [-0.8, 0.8, 0, 1]]], jnp.float32)
    col = jnp.asarray([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], jnp.float32)
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)
    rast, _ = dr.rasterize(None, pos, tri, (64, 64))
    img, _ = dr.interpolate(col, rast, tri)
    out["triangle"] = img

    # cube (color interpolation + AA)
    pos_idx, vtxp, col_idx, _ = primitives.cube_continuous()
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    mvp = (camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
           @ camera.rotate_y(0.7) @ camera.rotate_x(0.4))
    p = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    t = jnp.asarray(pos_idx)
    rast, _ = dr.rasterize(None, p, t, (64, 64))
    img, _ = dr.interpolate(jnp.asarray((vtxp * 0.5 + 0.5)[None],), rast,
                            jnp.asarray(col_idx))
    out["cube"] = dr.antialias(img, rast, p, t)

    # earth-style (uv texture, trilinear mip)
    pos_idx, vtxp, uv_idx, vtxu = primitives.uv_sphere(12, 24)
    tex = primitives.checkerboard_texture(32, 64)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    p = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    t = jnp.asarray(pos_idx)
    rast, rast_db = dr.rasterize(None, p, t, (64, 64))
    texc, texd = dr.interpolate(jnp.asarray(vtxu)[None], rast,
                                jnp.asarray(uv_idx), rast_db=rast_db,
                                diff_attrs="all")
    out["earth"] = dr.texture(jnp.asarray(tex)[None], texc, texd,
                              filter_mode="linear-mipmap-linear")

    # envphong-style (cube map)
    rng = np.random.RandomState(0)
    env = jnp.asarray(rng.rand(1, 6, 16, 16, 3).astype(np.float32))
    view = jnp.asarray(vtxp.astype(np.float32))  # fake reflection vecs
    refl, _ = dr.interpolate(view[None], rast, t)
    out["envphong"] = dr.texture(env, refl, filter_mode="linear",
                                 boundary_mode="cube")

    # pose-style (silhouette + AA, different rotation)
    mvp2 = (camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
            @ camera.rotate_x(-0.6) @ camera.rotate_y(0.3))
    pos_idx, vtxp, col_idx, _ = primitives.cube_continuous()
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    p = jnp.asarray((posw @ mvp2.T)[None].astype(np.float32))
    t = jnp.asarray(pos_idx)
    rast, _ = dr.rasterize(None, p, t, (48, 48))
    sil = jnp.clip(rast[..., 3:], 0, 1)
    out["pose"] = dr.antialias(sil, rast, p, t)

    return {k: np.asarray(v) for k, v in out.items()}


def test_golden_renders():
    imgs = _workload_images()
    path = GOLDEN / "workloads.npz"
    assert path.exists(), (
        "golden file missing; run `python tests/test_parity_sweep.py "
        "--regen` and commit tests/golden/workloads.npz")
    ref = np.load(path)
    for k, v in imgs.items():
        np.testing.assert_allclose(
            v, ref[k], atol=1e-5, rtol=1e-5,
            err_msg=f"workload {k!r} drifted from golden render")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN / "workloads.npz", **_workload_images())
        print(f"wrote {GOLDEN / 'workloads.npz'}")
