"""Cube fitting: vertex positions + colors from low-res renders.

Re-creation of the reference sample samples/torch/cube.py:27-158 as a
jit-compiled JAX/optax optimization. Exercises rasterize + interpolate
+ antialias gradients end-to-end; the antialias position gradients are
what make convergence possible at 4-16 px resolution
(docs/index.html:806-813).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import ops  # noqa: F401  (package init side effects none)
from ..ops.rasterize import rasterize
from ..ops.interpolate import interpolate
from ..ops.antialias import antialias, antialias_construct_topology_hash
from ..utils import camera
from . import primitives


def render(mtx, pos, pos_idx, col, col_idx, resolution, topo=None):
    pos_clip = camera.transform_pos(mtx, pos)
    rast_out, _ = rasterize(None, pos_clip, pos_idx, (resolution, resolution))
    color, _ = interpolate(col[None], rast_out, col_idx)
    color = antialias(color, rast_out, pos_clip, pos_idx, topology_hash=topo)
    return color[0]


class CubeFitModel:
    """Vertex position/color optimization against a reference cube."""

    def __init__(self, resolution=16, discontinuous=False, seed=0, lr=1e-2):
        if discontinuous:
            pos_idx, vtxp, col_idx, vtxc = primitives.cube_discontinuous()
        else:
            pos_idx, vtxp, col_idx, vtxc = primitives.cube_continuous()
        self.pos_idx = jnp.asarray(pos_idx)
        self.col_idx = jnp.asarray(col_idx)
        self.vtx_pos = jnp.asarray(vtxp)
        self.vtx_col = jnp.asarray(vtxc)
        self.resolution = int(resolution)
        self.rng = np.random.RandomState(seed)

        self.params = {
            "pos": jnp.asarray(
                vtxp + self.rng.uniform(-0.5, 0.5, size=vtxp.shape),
                jnp.float32),
            "col": jnp.asarray(
                self.rng.uniform(0.0, 1.0, size=vtxc.shape), jnp.float32),
        }
        # Learning-rate ramp like the reference (cube.py:91).
        sched = lambda step: lr * jnp.maximum(0.01, 10.0 ** (-step * 0.0005))
        self.tx = optax.adam(sched)
        self.opt_state = self.tx.init(self.params)
        self.topo = antialias_construct_topology_hash(self.pos_idx)

        resolution = self.resolution
        pos_idx, col_idx, topo, tx = self.pos_idx, self.col_idx, self.topo, self.tx
        vtx_pos, vtx_col = self.vtx_pos, self.vtx_col

        @jax.jit
        def _train_step(params, opt_state, mtx):
            target_img = render(mtx, vtx_pos, pos_idx, vtx_col, col_idx,
                                resolution, topo=topo)

            def loss_fn(p):
                img = render(mtx, p["pos"], pos_idx, p["col"], col_idx,
                             resolution, topo=topo)
                return jnp.mean((img - target_img) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = _train_step

    def random_mvp(self):
        rot = camera.random_rotation_translation(0.25, self.rng)
        mv = camera.translate(0, 0, -3.5) @ rot
        return (camera.projection(x=0.4) @ mv).astype(np.float32)

    def geometric_error(self):
        """Mean distance of optimized vertices from the +-0.5 cube surface
        (the reference's convergence metric, cube.py:108)."""
        p = self.params["pos"]
        return float(jnp.mean(
            jnp.sum((jnp.abs(p) - 0.5) ** 2, axis=1) ** 0.5))

    def step(self):
        mtx = jnp.asarray(self.random_mvp())
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, mtx)
        return float(loss)

    def fit(self, max_iter=1000, log_interval=0):
        for it in range(max_iter):
            loss = self.step()
            if log_interval and it % log_interval == 0:
                print(f"iter={it} loss={loss:.6f} "
                      f"err={self.geometric_error():.6f}")
        return self.geometric_error()
