"""Parity: fused Pallas texture sampler (interpret mode) vs XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdiffrast_tpu.ops.texture import texture


def _case(seed=0, B=2, H=33, W=47, th=32, tw=64, C=3, D=1, uv_scale=1.4,
          uv_shift=-0.2):
    rng = np.random.RandomState(seed)
    tex = jnp.asarray(rng.rand(D, th, tw, C).astype(np.float32))
    uv = jnp.asarray(
        (rng.rand(B, H, W, 2) * uv_scale + uv_shift).astype(np.float32))
    uv_da = jnp.asarray((rng.randn(B, H, W, 4) * 0.02).astype(np.float32))
    bias = jnp.asarray((rng.rand(B, H, W) * 2.0).astype(np.float32))
    return tex, uv, uv_da, bias


@pytest.mark.parametrize("filter_mode", [
    "linear", "linear-mipmap-nearest", "linear-mipmap-linear"])
@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
def test_texture_fused_forward_parity(filter_mode, boundary_mode):
    tex, uv, uv_da, _ = _case()
    kw = dict(filter_mode=filter_mode, boundary_mode=boundary_mode)
    if "mipmap" in filter_mode:
        kw["uv_da"] = uv_da
    a = texture(tex, uv, impl="xla", **kw)
    b = texture(tex, uv, impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


def test_texture_fused_minibatch_tex():
    tex, uv, uv_da, _ = _case(D=2, B=2)
    a = texture(tex, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                impl="xla")
    b = texture(tex, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


def test_texture_fused_bias_only():
    tex, uv, _, bias = _case()
    a = texture(tex, uv, mip_level_bias=bias, impl="xla")
    b = texture(tex, uv, mip_level_bias=bias, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
def test_texture_fused_gradient_parity(boundary_mode):
    tex, uv, uv_da, bias = _case(H=17, W=21)

    def loss(t, u, da, b, impl):
        o = texture(t, u, uv_da=da, mip_level_bias=b,
                    filter_mode="linear-mipmap-linear",
                    boundary_mode=boundary_mode, impl=impl)
        return jnp.sum(o ** 2 + 0.3 * o)

    gx = jax.grad(loss, argnums=(0, 1, 2, 3))(tex, uv, uv_da, bias, "xla")
    gp = jax.grad(loss, argnums=(0, 1, 2, 3))(tex, uv, uv_da, bias,
                                              "pallas_interpret")
    names = ("g_tex", "g_uv", "g_uv_da", "g_bias")
    for n, a, b in zip(names, gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_texture_fused_gradient_parity_linear():
    tex, uv, _, _ = _case(H=17, W=21)

    def loss(t, u, impl):
        o = texture(t, u, filter_mode="linear", boundary_mode="wrap",
                    impl=impl)
        return jnp.sum(o ** 2)

    gx = jax.grad(loss, argnums=(0, 1))(tex, uv, "xla")
    gp = jax.grad(loss, argnums=(0, 1))(tex, uv, "pallas_interpret")
    for n, a, b in zip(("g_tex", "g_uv"), gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4, err_msg=n)


def test_texture_fused_big_texture_windowed():
    """Pyramids past the VMEM table budget: the big levels are gathered
    through HBM windowed DMA (forced by shrinking the budget); forward
    and all gradients must match the XLA path."""
    from nvdiffrast_tpu.ops import texture_pallas as tp
    tex, uv, uv_da, bias = _case(H=17, W=21, th=64, tw=128)

    def loss(t, u, da, b, impl):
        o = texture(t, u, uv_da=da, mip_level_bias=b,
                    filter_mode="linear-mipmap-linear",
                    boundary_mode="wrap", impl=impl)
        return jnp.sum(o ** 2 + 0.3 * o)

    gx = jax.grad(loss, argnums=(0, 1, 2, 3))(tex, uv, uv_da, bias, "xla")
    orig = tp._MAX_VMEM_TABLE
    try:
        # 64x128 top level (x2 minibatch x3 ch) overflows a 16k-float
        # budget; levels 0-2 go to HBM windows, the tail stays VMEM.
        tp._MAX_VMEM_TABLE = 1 << 14
        fx = loss(tex, uv, uv_da, bias, "xla")
        fp = loss(tex, uv, uv_da, bias, "pallas_interpret")
        np.testing.assert_allclose(float(fp), float(fx), rtol=1e-5)
        gp = jax.grad(loss, argnums=(0, 1, 2, 3))(tex, uv, uv_da, bias,
                                                  "pallas_interpret")
    finally:
        tp._MAX_VMEM_TABLE = orig
    for n, a, b in zip(("g_tex", "g_uv", "g_uv_da", "g_bias"), gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_texture_fused_fd_gradient():
    """Finite differences directly against the fused path (uv grads)."""
    tex, uv, uv_da, _ = _case(H=9, W=11, th=16, tw=16)

    @jax.jit
    def loss(u):
        o = texture(tex, u, uv_da=uv_da,
                    filter_mode="linear-mipmap-linear",
                    impl="pallas_interpret")
        return jnp.sum(o ** 2)

    g = jax.jit(jax.grad(loss))(uv)
    rng = np.random.RandomState(3)
    for _ in range(4):
        b, i, j, k = (rng.randint(s) for s in uv.shape)
        eps = 1e-3
        up = uv.at[b, i, j, k].add(eps)
        um = uv.at[b, i, j, k].add(-eps)
        fd = (float(loss(up)) - float(loss(um))) / (2 * eps)
        np.testing.assert_allclose(float(g[b, i, j, k]), fd, atol=2e-2,
                                   rtol=5e-2)


# ---------------------------------------------------------------------------
# Cube maps.
# ---------------------------------------------------------------------------

def _cube_case(seed=0, B=2, H=17, W=21, fw=16, C=3, D=1):
    rng = np.random.RandomState(seed)
    tex = jnp.asarray(rng.rand(D, 6, fw, fw, C).astype(np.float32))
    # Directions including face-edge and corner crossers.
    v = rng.randn(B, H, W, 3).astype(np.float32)
    v[0, 0, 0] = [1.0, 1.0, 1.0]       # exact cube corner
    v[0, 0, 1] = [1.0, 1.0, 0.0]       # face edge
    v[0, 0, 2] = [0.0, 0.0, 0.0]       # invalid (zero vector)
    uv = jnp.asarray(v)
    uv_da = jnp.asarray((rng.randn(B, H, W, 6) * 0.05).astype(np.float32))
    return tex, uv, uv_da


@pytest.mark.parametrize("filter_mode", [
    "linear", "linear-mipmap-linear"])
def test_cube_fused_forward_parity(filter_mode):
    tex, uv, uv_da = _cube_case()
    kw = dict(filter_mode=filter_mode, boundary_mode="cube")
    if "mipmap" in filter_mode:
        kw["uv_da"] = uv_da
    a = texture(tex, uv, impl="xla", **kw)
    b = texture(tex, uv, impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


def test_cube_fused_minibatch_tex():
    tex, uv, uv_da = _cube_case(D=2, B=2)
    a = texture(tex, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                boundary_mode="cube", impl="xla")
    b = texture(tex, uv, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                boundary_mode="cube", impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


def test_cube_fused_big_face_windowed():
    """Cube pyramids past the VMEM budget: big face levels gather
    through HBM windowed DMA (forced by shrinking the budget)."""
    from nvdiffrast_tpu.ops import texture_pallas as tp
    tex, uv, uv_da = _cube_case(seed=3, H=13, W=15, fw=32)

    def loss(t, u, impl):
        o = texture(t, u, uv_da=uv_da, filter_mode="linear-mipmap-linear",
                    boundary_mode="cube", impl=impl)
        return jnp.sum(o ** 2 + 0.2 * o)

    fx = loss(tex, uv, "xla")
    gx = jax.grad(loss, argnums=(0, 1))(tex, uv, "xla")
    orig = tp._MAX_VMEM_TABLE
    try:
        # 6x32x32x3 top level (18k floats) overflows an 8k budget.
        tp._MAX_VMEM_TABLE = 1 << 13
        fp = loss(tex, uv, "pallas_interpret")
        np.testing.assert_allclose(float(fp), float(fx), rtol=1e-5)
        gp = jax.grad(loss, argnums=(0, 1))(tex, uv, "pallas_interpret")
    finally:
        tp._MAX_VMEM_TABLE = orig
    for n, a, b in zip(("g_tex", "g_uv"), gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_cube_fused_gradient_parity():
    tex, uv, uv_da = _cube_case(seed=2, H=13, W=15)

    def loss(t, u, da, impl):
        o = texture(t, u, uv_da=da, filter_mode="linear-mipmap-linear",
                    boundary_mode="cube", impl=impl)
        return jnp.sum(o ** 2 + 0.2 * o)

    gx = jax.grad(loss, argnums=(0, 1, 2))(tex, uv, uv_da, "xla")
    gp = jax.grad(loss, argnums=(0, 1, 2))(tex, uv, uv_da,
                                           "pallas_interpret")
    for n, a, b in zip(("g_tex", "g_uv", "g_uv_da"), gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4, err_msg=n)
