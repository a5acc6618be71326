"""Parity: fused Pallas AA kernels (interpret mode) vs the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops.antialias import antialias
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def _scene(res, seed=0, B=1):
    rng = np.random.default_rng(seed)
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(8, 12)
    tri = jnp.asarray(pos_idx)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    poss = []
    for b in range(B):
        mvp = (camera.projection(x=0.4)
               @ camera.translate(0.1 * b, -0.05, -3.2 + 0.2 * b)
               @ camera.random_rotation_translation(0.2, rng))
        poss.append((posw @ mvp.T).astype(np.float32))
    pos = jnp.asarray(np.stack(poss))
    col = jnp.asarray((vtxp * 0.5 + 0.5).astype(np.float32))
    rast, _ = rasterize(None, pos, tri, res)
    img, _ = interpolate(jnp.broadcast_to(col[None], (B,) + col.shape),
                         rast, jnp.asarray(col_idx))
    return pos, tri, rast, img


@pytest.mark.parametrize("res", [(48, 64), (67, 130), (96, 256)])
def test_aa_forward_parity(res):
    pos, tri, rast, img = _scene(res)
    o_x = antialias(img, rast, pos, tri, impl="xla")
    o_p = antialias(img, rast, pos, tri, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_x), np.asarray(o_p),
                               atol=1e-5, rtol=1e-5)


def test_aa_forward_parity_batched():
    pos, tri, rast, img = _scene((40, 72), B=3)
    o_x = antialias(img, rast, pos, tri, impl="xla")
    o_p = antialias(img, rast, pos, tri, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_x), np.asarray(o_p),
                               atol=1e-5, rtol=1e-5)


def test_aa_gradient_parity():
    pos, tri, rast, img = _scene((67, 130))

    def loss(p, c, impl):
        return jnp.sum(antialias(c, rast, p, tri, impl=impl) ** 2)

    gx = jax.grad(loss, argnums=(0, 1))(pos, img, "xla")
    gp = jax.grad(loss, argnums=(0, 1))(pos, img, "pallas_interpret")
    assert float(jnp.abs(gx[0]).sum()) > 0  # nontrivial scene
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                               atol=1e-5, rtol=1e-5)


def test_aa_pos_gradient_boost_fused():
    pos, tri, rast, img = _scene((48, 64))

    def loss(p, boost):
        return jnp.sum(antialias(img, rast, p, tri, pos_gradient_boost=boost,
                                 impl="pallas_interpret") ** 2)

    g1 = jax.grad(loss)(pos, 1.0)
    g3 = jax.grad(loss)(pos, 3.0)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g1) * 3.0,
                               rtol=1e-6)
