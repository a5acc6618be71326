"""Texture fitting with/without mipmaps (earth.py workload).

Re-creation of samples/torch/earth.py:27-173: learn a texture from
renders of a UV sphere, comparing mip-aware sampling (trilinear with
uv derivatives from interpolate's diff_attrs) against plain bilinear.
The earth.npz blob is missing from the reference mount, so the target
texture is procedural; the optimization structure and metrics (texture
PSNR) are the same.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.rasterize import rasterize
from ..ops.interpolate import interpolate
from ..ops.texture import texture
from ..utils import camera
from ..utils.image import bilinear_downsample, psnr
from . import primitives


def render(mtx, pos, pos_idx, uv, uv_idx, tex, resolution, enable_mip,
           max_mip_level):
    pos_clip = camera.transform_pos(mtx, pos)
    rast_out, rast_out_db = rasterize(None, pos_clip, pos_idx,
                                      (resolution, resolution))
    if enable_mip:
        texc, texd = interpolate(uv[None], rast_out, uv_idx,
                                 rast_db=rast_out_db, diff_attrs="all")
        color = texture(tex[None], texc, texd,
                        filter_mode="linear-mipmap-linear",
                        max_mip_level=max_mip_level)
    else:
        texc, _ = interpolate(uv[None], rast_out, uv_idx)
        color = texture(tex[None], texc, filter_mode="linear")
    # Mask out background (earth.py:38).
    return color * jnp.clip(rast_out[..., -1:], 0, 1)


class EarthFitModel:
    """Learn a texture from sphere renders; metric = texture PSNR."""

    def __init__(self, res=128, ref_res=256, tex_res=(128, 256),
                 enable_mip=True, max_mip_level=9, lr=1e-2, seed=0):
        pos_idx, vtxp, uv_idx, vtxu = primitives.uv_sphere(24, 48)
        self.pos_idx = jnp.asarray(pos_idx)
        self.uv_idx = jnp.asarray(uv_idx)
        self.vtx_pos = jnp.asarray(vtxp)
        self.vtx_uv = jnp.asarray(vtxu)
        self.tex_ref = jnp.asarray(
            primitives.checkerboard_texture(tex_res[0], tex_res[1]))
        self.res = int(res)
        self.ref_res = int(ref_res)
        self.enable_mip = bool(enable_mip)
        self.max_mip_level = max_mip_level
        self.rng = np.random.RandomState(seed)

        self.params = jnp.full(self.tex_ref.shape, 0.2, jnp.float32)
        sched = lambda step: lr * (0.1 ** (step / 20000.0))
        self.tx = optax.adam(sched)
        self.opt_state = self.tx.init(self.params)

        downsample_steps = int(np.log2(self.ref_res // self.res))

        @jax.jit
        def _step(params, opt_state, mtx):
            # Reference rendered at high res with mips, downsampled
            # (earth.py trains against a supersampled reference).
            ref = render(mtx, self.vtx_pos, self.pos_idx, self.vtx_uv,
                         self.uv_idx, self.tex_ref, self.ref_res, True,
                         self.max_mip_level)
            for _ in range(downsample_steps):
                ref = bilinear_downsample(ref)

            def loss_fn(p):
                img = render(mtx, self.vtx_pos, self.pos_idx, self.vtx_uv,
                             self.uv_idx, p, self.res, self.enable_mip,
                             self.max_mip_level)
                return jnp.mean((img - ref) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = jnp.clip(params, 0.0, 1.0)
            return params, opt_state, loss

        self._step = _step

    def random_mvp(self):
        rot = camera.random_rotation_translation(0.25, self.rng)
        mv = camera.translate(0, 0, -3.5) @ rot
        return (camera.projection(x=0.4) @ mv).astype(np.float32)

    def texture_psnr(self):
        return psnr(self.params, self.tex_ref)

    def step(self):
        mtx = jnp.asarray(self.random_mvp())
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, mtx)
        return float(loss)

    def fit(self, max_iter=1000, log_interval=0):
        for it in range(max_iter):
            loss = self.step()
            if log_interval and it % log_interval == 0:
                print(f"iter={it} loss={loss:.6f} psnr={self.texture_psnr():.2f}")
        return self.texture_psnr()
