"""Parity of the fused textured pipeline against the composed ops."""

import numpy as np
import jax
import jax.numpy as jnp

import nvdiffrast_tpu as dr
from nvdiffrast_tpu.ops.pipeline_tex import render_pipeline_textured


def _scene(seed=0, B=2, V=50, T=40):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, (B, V, 4)).astype(np.float32)
    pos[..., 3] = rng.uniform(0.6, 1.8, (B, V))
    pos[0, :4, 3] = -0.2  # near-plane crossers
    tri = rng.randint(0, V, (T, 3)).astype(np.int32)
    uv = rng.uniform(-0.2, 1.2, (V, 2)).astype(np.float32)
    tex = rng.rand(1, 32, 64, 3).astype(np.float32)
    return (jnp.asarray(pos), jnp.asarray(tri), jnp.asarray(uv),
            jnp.asarray(tex))


def _composed(pos, tri, uv, tex, res, bm, fm, impl="xla"):
    rast, rast_db = dr.rasterize(None, pos, tri, res, grad_db=True,
                                 impl=impl)
    uvp, uv_da = dr.interpolate(uv, rast, tri, rast_db, diff_attrs="all",
                                impl=impl)
    img = dr.texture(tex, uvp, uv_da=uv_da, filter_mode=fm,
                     boundary_mode=bm, impl=impl)
    return dr.antialias(img, rast, pos, tri, impl=impl)


def test_textured_pipeline_forward_parity():
    pos, tri, uv, tex = _scene()
    res = (48, 64)
    for bm in ("wrap", "clamp"):
        a = _composed(pos, tri, uv, tex, res, bm, "linear-mipmap-linear")
        b = render_pipeline_textured(pos, tri, uv, tex, res,
                                     boundary_mode=bm,
                                     impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_textured_pipeline_gradient_parity():
    pos, tri, uv, tex = _scene(seed=1)
    res = (48, 64)

    def loss_c(p, u, t):
        o = _composed(p, tri, u, t, res, "wrap", "linear-mipmap-linear",
                      impl="pallas_interpret")
        return jnp.sum(o ** 2 + 0.1 * o)

    def loss_f(p, u, t):
        o = render_pipeline_textured(p, tri, u, t, res,
                                     impl="pallas_interpret")
        return jnp.sum(o ** 2 + 0.1 * o)

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(pos, uv, tex)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(pos, uv, tex)
    # The mip path runs the slim pipeline-level backward (one fused
    # interp+raster pass + one hi/lo MXU scatter) — same formulas as
    # the composed ops but a different f32 rounding path (fma
    # contraction + bf16 hi/lo accumulation), amplified at
    # ill-conditioned pixels by the 1/(at + 1e-6) pole. Both sides sit
    # ~2e-6 of scale from the f64 ground truth (see
    # test_interp_raster_bwd_matches_f64); bound the disagreement at
    # 5e-5 of scale.
    for n, a, b in zip(("g_pos", "g_uv", "g_tex"), gc, gf):
        scale = float(jnp.max(jnp.abs(a)))
        assert scale > 0, n
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 5e-5 * scale, (n, d, scale)


def test_textured_pipeline_cube():
    """Cube-map branch (envphong shape): reflection-vector attrs,
    seamless cube sampling, AA — vs the composed ops, same impl."""
    rng = np.random.RandomState(5)
    B, V, T = 1, 40, 32
    pos = rng.uniform(-1, 1, (B, V, 4)).astype(np.float32)
    pos[..., 3] = rng.uniform(0.6, 1.8, (B, V))
    tri = rng.randint(0, V, (T, 3)).astype(np.int32)
    refl = rng.randn(V, 3).astype(np.float32)
    tex = rng.rand(1, 6, 16, 16, 3).astype(np.float32)
    pos, tri, refl, tex = (jnp.asarray(a) for a in (pos, tri, refl, tex))
    res = (48, 64)

    def loss_c(p, r, t):
        rast, rast_db = dr.rasterize(None, p, tri, res, grad_db=True,
                                     impl="pallas_interpret")
        uvp, uv_da = dr.interpolate(r, rast, tri, rast_db,
                                    diff_attrs="all",
                                    impl="pallas_interpret")
        img = dr.texture(t, uvp, uv_da=uv_da,
                         filter_mode="linear-mipmap-linear",
                         boundary_mode="cube", impl="pallas_interpret")
        img = dr.antialias(img, rast, p, tri, impl="pallas_interpret")
        return jnp.sum(img ** 2 + 0.1 * img)

    def loss_f(p, r, t):
        o = render_pipeline_textured(p, tri, r, t, res,
                                     boundary_mode="cube",
                                     impl="pallas_interpret")
        return jnp.sum(o ** 2 + 0.1 * o)

    np.testing.assert_allclose(float(loss_f(pos, refl, tex)),
                               float(loss_c(pos, refl, tex)), rtol=1e-5)
    gc = jax.grad(loss_c, argnums=(0, 1, 2))(pos, refl, tex)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(pos, refl, tex)
    # Cube glue computes st_da via jvp over columns instead of a
    # stacked [N, 3] array, so rounding differs at f32 associativity
    # level (observed ~6e-8 relative) — not bit-identical like 2D.
    for n, a, b in zip(("g_pos", "g_refl", "g_tex"), gc, gf):
        assert float(jnp.abs(a).sum()) > 0, n
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6 * max(scale, 1.0),
                                   rtol=1e-5, err_msg=n)


def test_textured_pipeline_minibatch_tex_and_boost():
    pos, tri, uv, _ = _scene(seed=2)
    rng = np.random.RandomState(3)
    tex = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    res = (40, 48)

    def loss_c(p):
        o = _composed(p, tri, uv, tex, res, "clamp", "linear",
                      impl="pallas_interpret")
        return jnp.sum(o ** 2)

    def loss_f(p):
        o = render_pipeline_textured(p, tri, uv, tex, res,
                                     boundary_mode="clamp",
                                     filter_mode="linear",
                                     impl="pallas_interpret")
        return jnp.sum(o ** 2)

    np.testing.assert_allclose(float(loss_f(pos)), float(loss_c(pos)),
                               rtol=1e-5)
    gc = jax.grad(loss_c)(pos)
    gf = jax.grad(loss_f)(pos)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gc),
                               atol=1e-6, rtol=1e-6)


def test_interp_raster_bwd_kernel_columns():
    """The fused interp+raster backward pass emits the same per-pixel
    gradient columns as the composed-op XLA ingredients.

    Exact for the masked (gu, gv) rows; the raster/da columns follow a
    different f32 rounding path (fma contraction differs per fusion
    context) amplified by the 1/(at + 1e-6) pole, so they are bounded
    at 2e-5 of scale — an f64-reference run puts BOTH sides ~2e-6 of
    scale from ground truth (benchmarks round-5 notes)."""
    from nvdiffrast_tpu.ops import coord
    from nvdiffrast_tpu.ops import pipeline_tex_pallas as ptp
    from nvdiffrast_tpu.ops.pipeline import _attr_table
    from nvdiffrast_tpu.ops.antialias import _build_tables
    from nvdiffrast_tpu.ops.rasterize import (_raster_grad_pixel_cols,
                                              rasterize_flat)
    from nvdiffrast_tpu.ops.gather import table_take
    from nvdiffrast_tpu.ops.topology import build_opposite_table

    pos, tri, uv, _ = _scene(seed=7)
    B, T = pos.shape[0], tri.shape[0]
    H, W = 48, 64
    N = B * H * W
    rng = np.random.RandomState(11)

    u, v, zw, idf, d0, d1, d2, d3 = rasterize_flat(
        pos, tri, (H, W), "pallas_interpret", True)
    gu = jnp.asarray(rng.randn(N).astype(np.float32))
    gv = jnp.asarray(rng.randn(N).astype(np.float32))
    gda4 = jnp.asarray(rng.randn(4, N).astype(np.float32))
    db4 = jnp.stack([d0, d1, d2, d3])

    op_table = build_opposite_table(tri)
    atbl, _ = _attr_table(uv, tri, True, B, T)
    _, vtbl, R, _ = _build_tables(pos, tri, op_table, True, H, W)
    pix = jnp.arange(N, dtype=jnp.int32)
    rofs = (pix // (H * W)) * T
    xs, xo, ys, yo = coord.pixel_scale_offset(H, W)
    fxc = (pix % W).astype(jnp.float32) * xs + xo
    fyc = ((pix // W) % H).astype(jnp.float32) * ys + yo

    out15 = ptp.interp_raster_bwd_tex(
        atbl, vtbl, idf, u, v, gu, gv, gda4, db4, rofs, fxc, fyc, T,
        2.0 / W, 2.0 / H, interpret=True)

    # Composed-op reference: interpolate bwd (XLA formulas) chained
    # into the rasterize bwd columns.
    idbuf = coord.float_to_triidx(idf) - 1
    valid = (idbuf >= 0) & (idbuf < T)
    rid = jnp.where(valid, idbuf + rofs, R)
    g6 = table_take(atbl, rid)
    dsd = [g6[0] - g6[4], g6[1] - g6[5], g6[2] - g6[4], g6[3] - g6[5]]
    gyu = jnp.where(valid, gu, 0.0)
    gyv = jnp.where(valid, gv, 0.0)
    gb0 = gyu * dsd[0] + gyv * dsd[1]
    gb1 = gyu * dsd[2] + gyv * dsd[3]
    dm = [jnp.where(valid, c, 0.0) for c in (d0, d1, d2, d3)]
    gdb = [jnp.zeros_like(gb0) for _ in range(4)]
    cda = []
    for j in range(2):
        gdax, gday = gda4[2 * j], gda4[2 * j + 1]
        cda.append(jnp.where(valid, dm[0] * gdax + dm[1] * gday, 0.0))
        cda.append(jnp.where(valid, dm[2] * gdax + dm[3] * gday, 0.0))
        gdb[0] += gdax * dsd[2 * 0 + j]
        gdb[1] += gday * dsd[2 * 0 + j]
        gdb[2] += gdax * dsd[2 * 1 + j]
        gdb[3] += gday * dsd[2 * 1 + j]
    gdb = [jnp.where(valid, c, 0.0) for c in gdb]
    g9, _, _, _ = _raster_grad_pixel_cols(
        pos, tri, idf, gb0, gb1, tuple(gdb), (H, W), B, True)

    np.testing.assert_array_equal(np.asarray(out15[0]), np.asarray(gyu))
    np.testing.assert_array_equal(np.asarray(out15[1]), np.asarray(gyv))
    for k in range(9):
        a = np.asarray(out15[2 + k])
        b = np.asarray(g9[k])
        s = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() <= 2e-5 * s, ("pos", k)
    # da attr terms: rows 11-14 = (c0_u, c0_v, c1_u, c1_v).
    order = [cda[0], cda[2], cda[1], cda[3]]
    for k in range(4):
        a = np.asarray(out15[11 + k])
        b = np.asarray(order[k])
        s = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() <= 1e-6 * s, ("cda", k)
