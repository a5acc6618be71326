"""Pallas TPU tiled rasterizer (the fast coverage path).

TPU-shaped replacement for CudaRaster's bin/coarse/fine stages
(csrc/common/cudaraster/impl/{BinRaster,CoarseRaster,FineRaster}.inl):

* **Binning** (XLA): subtriangles are sorted by the tile of their
  screen AABB (locality sort), grouped into fixed-size chunks, and a
  per-(tile, chunk) overlap mask is computed from chunk AABBs — the
  sort-based, statically-shaped substitute for CudaRaster's atomic
  segment allocators.
* **Pixel phase** (Pallas): grid (batch, tile_y, tile_x, chunk); the
  output (depth, id) tile block stays resident in VMEM across the
  chunk axis (accumulator pattern), each visited chunk evaluates the
  affine edge functions for GROUP subtriangles at a time over the
  whole TILE_H x TILE_W tile on the VPU, and non-overlapping chunks
  are skipped with `pl.when`. The depth test is a lexicographic
  (depth, id) minimum — the deterministic-ROP equivalent of
  FineRaster.inl:152-172 without atomics (lowest triangle index wins
  depth ties).

Coefficient layout per subtriangle (16 floats):
  [0:9]  three affine edge functions (const, d/dfx, d/dfy each),
  [9:12] z plane (parent), [12:15] w plane,
  [15]   triangle id as float (exact for ids < 2^24), or 1e30 when the
         subtriangle is invalid for this image. Meshes beyond 2^24
         triangles fall back to the XLA path.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import coord

TILE_H = 32
TILE_W = 128
CHUNK = 64
GROUP = 8

# Largest triangle count served by this kernel (float32-exact ids).
MAX_PALLAS_TRIS = 1 << 24

_INT32_MAX = jnp.iinfo(jnp.int32).max
_BIG = 1e30
_ID_INVALID = 1e30


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Binning (XLA, per image).
# ---------------------------------------------------------------------------

def _pixel_aabb(sub, ok, H, W):
    """Screen AABB per subtriangle in pixel-index units (empty if !ok)."""
    x = sub[..., 0]
    y = sub[..., 1]
    w = jnp.maximum(sub[..., 3], 1e-12)
    px = jnp.clip((x / w + 1.0) * (W * 0.5) - 0.5, -1e9, 1e9)
    py = jnp.clip((y / w + 1.0) * (H * 0.5) - 0.5, -1e9, 1e9)
    xmin = jnp.min(px, axis=-1)
    xmax = jnp.max(px, axis=-1)
    ymin = jnp.min(py, axis=-1)
    ymax = jnp.max(py, axis=-1)
    onscreen = ((xmax >= -0.5) & (xmin <= W - 0.5) &
                (ymax >= -0.5) & (ymin <= H - 0.5))
    ok = ok & onscreen
    xmin = jnp.where(ok, xmin, _BIG)
    ymin = jnp.where(ok, ymin, _BIG)
    xmax = jnp.where(ok, xmax, -_BIG)
    ymax = jnp.where(ok, ymax, -_BIG)
    return xmin, ymin, xmax, ymax, ok


def _sort_and_mask(coefs, aabb, H, W):
    """Locality-sort subtris; build the per-(tile, chunk) overlap mask.

    coefs: [S, 16] with slot 15 = id/invalid marker already folded in.

    Returns (coefs_sorted [S, 16], chunk_mask [n_tiles, nc] i32).
    """
    xmin, ymin, xmax, ymax, ok = aabb
    S = coefs.shape[0]
    nty = _cdiv(H, TILE_H)
    ntx = _cdiv(W, TILE_W)
    nc = S // CHUNK

    tx0 = jnp.clip(jnp.floor((xmin + 0.5) / TILE_W).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor((ymin + 0.5) / TILE_H).astype(jnp.int32), 0, nty - 1)
    key = jnp.where(ok, ty0 * ntx + tx0, _INT32_MAX)
    order = jnp.argsort(key)

    coefs_s = coefs[order]
    xmin_s, ymin_s = xmin[order], ymin[order]
    xmax_s, ymax_s = xmax[order], ymax[order]

    def creduce(v, red):
        return red(v.reshape(nc, CHUNK), axis=1)

    cxmin = creduce(xmin_s, jnp.min)
    cymin = creduce(ymin_s, jnp.min)
    cxmax = creduce(xmax_s, jnp.max)
    cymax = creduce(ymax_s, jnp.max)
    # Conservative tile range: pixel centers are integers, so pixels in
    # [ceil(min), floor(max)]; the +-0.5 slack keeps it conservative.
    ctx0 = jnp.clip(jnp.floor((cxmin + 0.5) / TILE_W).astype(jnp.int32), 0, ntx - 1)
    cty0 = jnp.clip(jnp.floor((cymin + 0.5) / TILE_H).astype(jnp.int32), 0, nty - 1)
    ctx1 = jnp.clip(jnp.floor((cxmax + 0.5) / TILE_W).astype(jnp.int32), 0, ntx - 1)
    cty1 = jnp.clip(jnp.floor((cymax + 0.5) / TILE_H).astype(jnp.int32), 0, nty - 1)
    cempty = cxmin > cxmax

    tyg = jnp.arange(nty, dtype=jnp.int32)[:, None, None]
    txg = jnp.arange(ntx, dtype=jnp.int32)[None, :, None]
    hit = ((tyg >= cty0[None, None]) & (tyg <= cty1[None, None]) &
           (txg >= ctx0[None, None]) & (txg <= ctx1[None, None]) &
           ~cempty[None, None])
    chunk_mask = hit.reshape(nty * ntx, nc).astype(jnp.int32)
    return coefs_s, chunk_mask


# ---------------------------------------------------------------------------
# Pallas kernel.
# ---------------------------------------------------------------------------

def _make_kernel(xs, xo, ys, yo):
    xs = float(xs)
    xo = float(xo)
    ys = float(ys)
    yo = float(yo)

    def kernel(mask_ref, coef_ref, zbuf_ref, idbuf_ref):
        c = pl.program_id(3)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        ntx = pl.num_programs(2)

        @pl.when(c == 0)
        def _():
            zbuf_ref[...] = jnp.full((1, TILE_H, TILE_W), jnp.inf, jnp.float32)
            idbuf_ref[...] = jnp.full((1, TILE_H, TILE_W), _ID_INVALID,
                                      jnp.float32)

        # Mask block holds 8 tile rows (SMEM tiling rules); pick ours.
        t_lin = ty * ntx + tx
        mrow = t_lin - (t_lin // 8) * 8

        @pl.when(mask_ref[0, mrow, c] != 0)
        def _():
            col = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
            row = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
            fxv = (col + (tx * TILE_W).astype(jnp.float32)) * xs + xo
            fyv = (row + (ty * TILE_H).astype(jnp.float32)) * ys + yo

            zb = zbuf_ref[0]
            ib = idbuf_ref[0]
            for g in range(CHUNK // GROUP):
                sl = slice(g * GROUP, (g + 1) * GROUP)
                cf = coef_ref[0, sl, :]  # [G, 16]

                def col(i):
                    # [G, 1, 1] static column slice (explicit lax.slice:
                    # jnp mixed slice+newaxis indexing lowers to gather,
                    # which Mosaic rejects).
                    s = jax.lax.slice_in_dim(cf, i, i + 1, axis=1)
                    return jnp.expand_dims(s, -1)

                def aff(i):
                    return (col(i)
                            + col(i + 1) * jnp.expand_dims(fxv, 0)
                            + col(i + 2) * jnp.expand_dims(fyv, 0))

                a0 = aff(0)
                a1 = aff(3)
                a2 = aff(6)
                cov = (((a0 > 0) & (a1 > 0) & (a2 > 0))
                       | ((a0 < 0) & (a1 < 0) & (a2 < 0)))
                z = aff(9)
                w = aff(12)
                idf = jnp.broadcast_to(col(15), (GROUP, TILE_H, TILE_W))
                depth = z / w
                okm = (cov & (w > 0) & (jnp.abs(depth) <= 1.0)
                       & (idf < 1e29))
                depth = jnp.where(okm, depth, jnp.inf)
                idsb = jnp.where(okm, idf, _ID_INVALID)
                dmin = jnp.min(depth, axis=0)
                imin = jnp.min(
                    jnp.where(depth == dmin[None], idsb, _ID_INVALID), axis=0)
                better = (dmin < zb) | ((dmin == zb) & (imin < ib))
                zb = jnp.where(better, dmin, zb)
                ib = jnp.where(better, imin, ib)
            zbuf_ref[0] = zb
            idbuf_ref[0] = ib

    return kernel


def coverage_pallas(sub, svalid, zcoef, wcoef, valid_b, tri_ids, B,
                    resolution, interpret=False):
    """Tiled Pallas coverage pass.

    Args:
      sub: [S, 3, 4] (range mode, shared) or [B, S, 3, 4] clipped
        subtriangle vertices.
      svalid: [S] or [B, S] bool — geometric validity.
      zcoef, wcoef: [.., S, 3] parent plane coefficients.
      valid_b: [B, S] bool — per-image validity (range masks folded in).
      tri_ids: [S] int32 parent triangle ids.
      resolution: (H, W).

    Returns:
      idbuf [B, H, W] int32 (-1 = empty), zbuf [B, H, W] float32.
    """
    from .rasterize import _edge_coeffs  # local import to avoid cycle

    H, W = resolution
    S = tri_ids.shape[0]
    nty = _cdiv(H, TILE_H)
    ntx = _cdiv(W, TILE_W)
    Hp, Wp = nty * TILE_H, ntx * TILE_W
    shared_geom = sub.ndim == 3

    ecoef = _edge_coeffs(sub)  # [.., S, 3, 3]
    base = jnp.concatenate([
        ecoef.reshape(ecoef.shape[:-2] + (9,)), zcoef, wcoef], axis=-1)
    if shared_geom:
        base = jnp.broadcast_to(base[None], (B,) + base.shape)
        sub_b = sub
        svalid_b = svalid
    else:
        sub_b = sub
        svalid_b = svalid

    # Slot 15: float id when valid for the image, else invalid marker.
    idf = jnp.where(valid_b, tri_ids[None].astype(jnp.float32), _ID_INVALID)
    coefs = jnp.concatenate([base, idf[..., None]], axis=-1)  # [B, S, 16]

    # Pad S to a CHUNK multiple.
    S_pad = _cdiv(S, CHUNK) * CHUNK
    nc = S_pad // CHUNK
    dpad = S_pad - S

    def padn(a, axis, value=0):
        if dpad == 0:
            return a
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, dpad)
        return jnp.pad(a, cfg, constant_values=value)

    coefs = padn(coefs, 1)
    if dpad:
        coefs = coefs.at[:, S:, 15].set(_ID_INVALID)
    s_axis = 0 if shared_geom else 1
    sub_p = padn(sub_b, s_axis)
    svalid_p = padn(svalid_b, s_axis)

    # Binning. Geometry (and thus the sort order + chunk mask) is
    # shared in range mode, per-image in instance mode.
    if shared_geom:
        aabb = _pixel_aabb(sub_p, svalid_p, H, W)
        xmin, ymin, xmax, ymax, ok = aabb
        key_aabb = aabb
        coefs_s, chunk_mask = jax.vmap(
            lambda cf: _sort_and_mask(cf, key_aabb, H, W))(coefs)
        chunk_mask = chunk_mask[:1]  # identical across B
        mask_in = chunk_mask
    else:
        aabb = _pixel_aabb(sub_p, svalid_p, H, W)
        coefs_s, chunk_mask = jax.vmap(
            lambda cf, a0, a1, a2, a3, a4: _sort_and_mask(
                cf, (a0, a1, a2, a3, a4), H, W))(coefs, *aabb)
        mask_in = chunk_mask

    Bm = mask_in.shape[0]
    # Pad the tile axis of the mask to a multiple of 8 so the SMEM
    # block (1, 8, nc) satisfies the TPU block tiling rules.
    n_tiles = nty * ntx
    nt_pad = _cdiv(n_tiles, 8) * 8
    if nt_pad != n_tiles:
        mask_in = jnp.pad(mask_in, ((0, 0), (0, nt_pad - n_tiles), (0, 0)))

    kernel = _make_kernel(*coord.pixel_scale_offset(H, W))
    grid = (B, nty, ntx, nc)

    zbuf, idfbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Chunk mask lives in SMEM (dynamic scalar reads); the
            # block carries 8 tile rows to satisfy tiling rules.
            pl.BlockSpec((1, 8, nc),
                         lambda b, ty, tx, c: (b if Bm > 1 else 0,
                                               (ty * ntx + tx) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK, 16),
                         lambda b, ty, tx, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, c: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, c: (b, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(mask_in, coefs_s)

    zbuf = zbuf[:, :H, :W]
    idfbuf = idfbuf[:, :H, :W]
    idbuf = jnp.where(idfbuf < 1e29, idfbuf.astype(jnp.int32), -1)
    return idbuf, zbuf
