"""Round-3 Mosaic compile/correctness smoke on real TPU.

Each stage exercises one new kernel path at small shapes (fast
compiles) and checks against the XLA path, so a Mosaic lowering
failure is isolated to a named stage:

  1. rasterizer: 16-float records, remap path (+ grad)
  2. rasterizer: CSR segment path (forced)
  3. rasterizer: dense nc==1 path
  4. texture: apron-lattice gradient scatter (small texture)
  5. texture: HBM windowed gather fwd+grad (forced big path)
  6. cube: HBM windowed faces (forced)
  7. AA: tile-major kernels fwd+grad
  8. scatter: row-blocked path (forced)
  9. fused render_pipeline fwd+grad

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/smoke_r3.py [stage...]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def _scene(B=1, T=120, seed=0):
    rng = np.random.RandomState(seed)
    V = 80
    pos = rng.uniform(-1, 1, (B, V, 4)).astype(np.float32)
    pos[..., 3] = rng.uniform(0.6, 1.8, (B, V))
    pos[0, :6, 3] = -0.2  # near-plane crossers
    tri = rng.randint(0, V, (T, 3)).astype(np.int32)
    return jnp.asarray(pos), jnp.asarray(tri)


def _ids_close(r_x, r_p, max_frac=2e-3):
    ix = np.asarray(r_x[..., 3])
    ip = np.asarray(r_p[..., 3])
    differ = ix != ip
    if differ.any():
        zx = np.asarray(r_x[..., 2])[differ]
        zp = np.asarray(r_p[..., 2])[differ]
        np.testing.assert_allclose(zx, zp, atol=1e-4)
        assert differ.mean() <= max_frac, differ.mean()


def stage1():
    import nvdiffrast_tpu as dr
    pos, tri = _scene()
    r_p, db_p = jax.jit(lambda p: dr.rasterize(
        None, p, tri, (192, 256), grad_db=True, impl="pallas"))(pos)
    r_x, db_x = jax.jit(lambda p: dr.rasterize(
        None, p, tri, (192, 256), grad_db=True, impl="xla"))(pos)
    _ids_close(r_x, r_p)

    def loss(p, impl):
        r, _ = dr.rasterize(None, p, tri, (192, 256), impl=impl)
        return jnp.sum(r[..., :2] ** 2)
    g_p = jax.jit(jax.grad(lambda p: loss(p, "pallas")))(pos)
    g_x = jax.jit(jax.grad(lambda p: loss(p, "xla")))(pos)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=5e-3, rtol=5e-2)


def stage2():
    import nvdiffrast_tpu as dr
    from nvdiffrast_tpu.ops import rasterize_pallas as rp
    pos, tri = _scene(T=900, seed=3)
    r_p, _ = jax.jit(lambda p: dr.rasterize(
        None, p, tri, (192, 256), impl="pallas"))(pos)
    orig = rp._REMAP_MAX_ENTRIES
    try:
        rp._REMAP_MAX_ENTRIES = 0
        r_c, _ = jax.jit(lambda p: dr.rasterize(
            None, p, tri, (192, 256), impl="pallas"))(pos)
    finally:
        rp._REMAP_MAX_ENTRIES = orig
    _ids_close(r_p, r_c)


def stage3():
    import nvdiffrast_tpu as dr
    pos, tri = _scene(T=40, seed=4)  # nc == 1 -> dense branch
    r_p, _ = jax.jit(lambda p: dr.rasterize(
        None, p, tri, (128, 128), impl="pallas"))(pos)
    r_x, _ = jax.jit(lambda p: dr.rasterize(
        None, p, tri, (128, 128), impl="xla"))(pos)
    _ids_close(r_x, r_p)


def _uv_field(B, H, W):
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    uv = np.stack([xx * 1.05 - 0.02, yy], -1)[None]
    return jnp.asarray(np.broadcast_to(uv, (B, H, W, 2)).astype(np.float32))


def _tex_stage(ts, force_big):
    from nvdiffrast_tpu.ops.texture import texture
    from nvdiffrast_tpu.ops import texture_pallas as tp
    rng = np.random.RandomState(0)
    B, H, W = 1, 256, 256
    tex = jnp.asarray(rng.rand(1, ts, ts, 3).astype(np.float32))
    uv = _uv_field(B, H, W)
    uv_da = jnp.asarray(np.full((B, H, W, 4), 2e-3, np.float32))

    def loss(t, impl):
        o = texture(t, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                    boundary_mode="wrap", impl=impl)
        return jnp.sum(o ** 2)

    orig = tp._MAX_VMEM_TABLE
    try:
        if force_big:
            tp._MAX_VMEM_TABLE = 1 << 14
        f_p = float(jax.jit(lambda t: loss(t, "pallas"))(tex))
        g_p = jax.jit(jax.grad(lambda t: loss(t, "pallas")))(tex)
    finally:
        tp._MAX_VMEM_TABLE = orig
    f_x = float(jax.jit(lambda t: loss(t, "xla"))(tex))
    g_x = jax.jit(jax.grad(lambda t: loss(t, "xla")))(tex)
    np.testing.assert_allclose(f_p, f_x, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-3, rtol=1e-2)


def stage4():
    _tex_stage(128, force_big=False)


def stage5():
    _tex_stage(256, force_big=True)


def stage6():
    from nvdiffrast_tpu.ops.texture import texture
    from nvdiffrast_tpu.ops import texture_pallas as tp
    rng = np.random.RandomState(1)
    B, H, W = 1, 256, 256
    tex = jnp.asarray(rng.rand(1, 6, 64, 64, 3).astype(np.float32))
    v = rng.randn(B, H, W, 3).astype(np.float32)
    uv = jnp.asarray(v)
    uv_da = jnp.asarray((rng.randn(B, H, W, 6) * 0.01).astype(np.float32))

    def loss(t, impl):
        o = texture(t, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                    boundary_mode="cube", impl=impl)
        return jnp.sum(o ** 2)

    orig = tp._MAX_VMEM_TABLE
    try:
        tp._MAX_VMEM_TABLE = 1 << 13
        f_p = float(jax.jit(lambda t: loss(t, "pallas"))(tex))
        g_p = jax.jit(jax.grad(lambda t: loss(t, "pallas")))(tex)
    finally:
        tp._MAX_VMEM_TABLE = orig
    f_x = float(jax.jit(lambda t: loss(t, "xla"))(tex))
    g_x = jax.jit(jax.grad(lambda t: loss(t, "xla")))(tex)
    np.testing.assert_allclose(f_p, f_x, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=1e-3, rtol=1e-2)


def stage7():
    import nvdiffrast_tpu as dr
    pos, tri = _scene(T=60, seed=5)
    col = jnp.asarray(
        np.random.RandomState(2).rand(1, 80, 3).astype(np.float32))

    def loss(p, c, impl):
        r, _ = dr.rasterize(None, p, tri, (192, 256), impl=impl)
        img, _ = dr.interpolate(c, r, tri)
        img = dr.antialias(img, r, p, tri, impl=impl)
        return jnp.sum(img ** 2)

    f_p = float(jax.jit(lambda p, c: loss(p, c, "pallas"))(pos, col))
    f_x = float(jax.jit(lambda p, c: loss(p, c, "xla"))(pos, col))
    np.testing.assert_allclose(f_p, f_x, rtol=1e-3)
    g_p = jax.jit(jax.grad(lambda p, c: loss(p, c, "pallas")))(pos, col)
    g_x = jax.jit(jax.grad(lambda p, c: loss(p, c, "xla")))(pos, col)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               atol=5e-2, rtol=1e-1)


def stage8():
    from nvdiffrast_tpu.ops import scatter as sc
    rng = np.random.RandomState(7)
    K, R, N = 5, 60000, 1 << 17
    ids = np.sort(rng.randint(0, R, N)).astype(np.int32)
    vals = rng.randn(K, N).astype(np.float32)
    a = sc.scatter_add_by_id(jnp.asarray(ids), jnp.asarray(vals), R,
                             method="scatter")
    orig = sc._PALLAS_MAX_ACC
    try:
        sc._PALLAS_MAX_ACC = 40 * 2048
        c = sc.scatter_add_by_id(jnp.asarray(ids), jnp.asarray(vals), R,
                                 method="pallas")
    finally:
        sc._PALLAS_MAX_ACC = orig
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                               atol=3e-5 * scale)


def stage9():
    from nvdiffrast_tpu.ops.pipeline import render_pipeline
    pos, tri = _scene(T=60, seed=6)
    col = jnp.asarray(
        np.random.RandomState(3).rand(80, 3).astype(np.float32))

    def loss(p, c):
        img = render_pipeline(p, tri, c, (192, 256))
        return jnp.sum(img ** 2)

    f = float(jax.jit(loss)(pos, col))
    g = jax.jit(jax.grad(loss))(pos, col)
    assert np.isfinite(f) and np.all(np.isfinite(np.asarray(g)))


def main():
    print("backend:", jax.default_backend())
    stages = sys.argv[1:] or [str(i) for i in range(1, 10)]
    for s in stages:
        fn = globals()[f"stage{s}"]
        try:
            fn()
            print(f"stage {s}: OK")
        except Exception as e:  # noqa: BLE001 — isolate per stage
            print(f"stage {s}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
