"""Parity: fused Pallas interpolate (interpret mode) vs XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def _scene(res=(48, 64), B=1, seed=0):
    rng = np.random.default_rng(seed)
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(8, 12)
    tri = jnp.asarray(pos_idx)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    poss = []
    for b in range(B):
        mvp = (camera.projection(x=0.4)
               @ camera.translate(0.05 * b, 0, -3.2)
               @ camera.random_rotation_translation(0.2, rng))
        poss.append((posw @ mvp.T).astype(np.float32))
    pos = jnp.asarray(np.stack(poss))
    attr = jnp.asarray(rng.standard_normal(
        (B, vtxp.shape[0], 5)).astype(np.float32))
    rast, rast_db = rasterize(None, pos, tri, res)
    return attr, rast, rast_db, jnp.asarray(col_idx)


@pytest.mark.parametrize("diff", [None, "all", [0, -1]])
def test_interp_fused_forward_parity(diff):
    attr, rast, rast_db, tri = _scene()
    kw = dict(rast_db=rast_db, diff_attrs=diff) if diff else {}
    ox, dax = interpolate(attr, rast, tri, impl="xla", **kw)
    op, dap = interpolate(attr, rast, tri, impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dap), np.asarray(dax),
                               atol=1e-6, rtol=1e-6)


def test_interp_fused_gradient_parity():
    attr, rast, rast_db, tri = _scene(B=2, seed=3)

    def loss(a, r, rdb, impl):
        o, da = interpolate(a, r, tri, rast_db=rdb, diff_attrs="all",
                            impl=impl)
        return jnp.sum(o ** 2) + jnp.sum(da ** 2 * 0.1)

    gx = jax.grad(loss, argnums=(0, 1, 2))(attr, rast, rast_db, "xla")
    gp = jax.grad(loss, argnums=(0, 1, 2))(attr, rast, rast_db,
                                           "pallas_interpret")
    for n, a, b in zip(("g_attr", "g_rast", "g_rast_db"), gx, gp):
        assert float(jnp.abs(a).sum()) > 0, n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5, err_msg=n)


def test_interp_fused_broadcast_attr():
    attr, rast, rast_db, tri = _scene(B=2, seed=1)
    attr1 = attr[:1]

    def loss(a, impl):
        o, _ = interpolate(a, rast, tri, impl=impl)
        return jnp.sum(o ** 2)

    gx = jax.grad(loss)(attr1, "xla")
    gp = jax.grad(loss)(attr1, "pallas_interpret")
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-5, rtol=1e-5)
