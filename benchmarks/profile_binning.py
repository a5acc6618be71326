"""Break down the big-mesh binning prepass (VERDICT r4 #4).

Round 3 measured the XLA-side layout at ~100 ms of the 304 ms 1M-tri
forward. This times each stage of the prepass separately on real TPU
so the optimization (counting-sort layout vs argsort) targets the real
cost:

  records   — _build_records (edge/plane coeffs, clip AABB polygons)
  aabb      — + per-record screen AABB union
  key+sort  — + bin key and the argsort itself
  layout    — + the [S, 16] record gather and group AABBs (full
              _sort_records / _csr_layout)
  fwd       — the full rasterize forward for reference

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_binning.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure  # window-difference timing (cancels RTT)

from nvdiffrast_tpu.ops import rasterize_pallas as rp
from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def timeit(fn, args_list):
    """Window-difference timing: see bench._measure. Each stage fn is
    wrapped so argset i returns a tuple whose [0] is host-readable."""
    def step(*a):
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return (leaf.ravel()[:1],)
    return _measure(jax.jit(step), args_list)


def main():
    print("backend:", jax.default_backend(), flush=True)
    H = W = 2048
    pos_idx, vtxp, _, _ = primitives.uv_sphere(512, 1024)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos0 = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    tri = jnp.asarray(pos_idx)
    T = int(tri.shape[0])
    poss = [pos0 * jnp.float32(1.0 + i * 1e-6) for i in range(3)]

    nty = -(-H // rp.TILE_H)
    wp0 = -(-W // rp.LANE) * rp.LANE
    ntx = -(-wp0 // rp.MAX_TILE_W)
    tile_w = rp.LANE * (-(-(wp0 // rp.LANE) // ntx))
    target = -(-T // 64)
    chunk = min(rp.CHUNK_CAP, max(rp.MAX_CHUNK, -(-target // 64) * 64),
                -(-T // (8 * rp.GROUP)) * 8 * rp.GROUP)
    print(f"T={T} nty={nty} ntx={ntx} tile_w={tile_w} chunk={chunk}",
          flush=True)

    tri_ids = jnp.arange(T, dtype=jnp.int32)

    def records(pos):
        return rp._build_records_cm(pos[0], tri, tri_ids)

    def aabb_of(pos):
        rec_cm, clipc, valid, slop = records(pos)
        sx, sy, sw, sv = clipc
        return rec_cm, rp._aabb_union_cols(sx, sy, sw, sv, valid, slop,
                                           H, W, 0, H)

    def keysort(pos):
        rec, (xmin, ymin, xmax, ymax, ok) = aabb_of(pos)
        band = jnp.clip(((ymin + 0.5) // rp.TILE_H).astype(jnp.int32),
                        0, nty - 1)
        tx0 = jnp.clip(((xmin + 0.5) // tile_w).astype(jnp.int32),
                       0, ntx - 1)
        key = jnp.where(ok, band * ntx + tx0, jnp.iinfo(jnp.int32).max)
        return jnp.argsort(key)

    def sortrec(pos):
        rec, aabb = aabb_of(pos)
        return rp._sort_records(rec, aabb, nty, ntx, tile_w)

    def csrlay(pos):
        rec, aabb = aabb_of(pos)
        return rp._csr_layout(rec, aabb, nty, ntx, tile_w, chunk)

    def fwd(pos):
        return rasterize(None, pos, tri, (H, W), impl="pallas")[0]

    for name, fn in (("records", records), ("aabb", aabb_of),
                     ("key+argsort", keysort), ("sort_records", sortrec),
                     ("csr_layout", csrlay), ("full fwd", fwd)):
        dt = timeit(fn, [(p,) for p in poss])
        print(f"{name:14s} {dt * 1e3:8.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
