"""Slim fused backward for the textured pipeline (TPU extension).

The composed flat chain (ops/pipeline_tex.py) backward runs four op
backwards, each with its own table gathers, fat gradient streams and
MXU scatter: AA emits [9, 2N] pair position rows, interpolate scatters
[3A, N] attr rows, rasterize re-gathers the vertex table and scatters
[9, N] pos rows. On-chip (benchmarks/profile_flatchain.py) the
rasterize(db) backward alone is ~16 ms and AA ~12 ms at 2048^2.

This module ports the untextured pipeline's slim-stream design
(ops/pipeline_pallas.py, 248 Mpix/s headline) to the textured chain:

* ``aa_bwd_slim_cols`` — the AA backward WITHOUT pair_pos_grad
  expansion: elementwise XLA producing the color cotangent plus the
  2-row (dd, rid) pair streams; the analytic position gradients are
  replayed inside the fused scatter (pipeline_pallas.
  pipeline_grad_scatter with the same dd/rid contract).
* ``interp_raster_bwd_tex`` — ONE Pallas pass for the interpolate(uv,
  da) + rasterize(db) backward: gathers the uv attr table and the
  clip-space vertex table from VMEM, runs the interpolate bary/da
  gradients (interpolate.cu:131-274) and the full db-aware rasterize
  gradient (rasterize.cu:119-273) in registers, and emits 15 slim
  rows: (gu, gv) masked, 9 vertex-pos columns, and the 4 per-pixel da
  attr terms (c0_j, c1_j) that the fused scatter expands with the
  barycentric outer product.

Together with pipeline_grad_scatter(da4=...) the whole non-texture
backward becomes: tiny XLA glue + 1 Pallas pass + 1 MXU scatter.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .antialias_pallas import _cdiv, _flatpad, _masked_gather, _prep_table, _Sub

LANE = 128


# ---------------------------------------------------------------------------
# Slim AA backward (XLA): color cotangent + pair streams, no
# pair_pos_grad, no table gather, no scatter. Mirrors
# antialias._aa_backward_core's stream math exactly (same rounding).
# ---------------------------------------------------------------------------

def aa_bwd_slim_cols(dy_cm, c0_cm, idf, al_ax, T, B, H, W):
    """AA backward, slim emission.

    Args:
      dy_cm: [C, N] loss cotangent (channel-major).
      c0_cm: [C, N] pre-AA color (the texture output).
      idf: [N] rast id channel.
      al_ax: (al0, ax0, al1, ax1) forward residuals as returned by
        antialias_pallas.aa_forward_fused_cols — PADDED TILE ORDER;
        untiled here (padding lanes can carry replicated al != 0 and
        must be stripped before anything that scatters).
      T: triangles; B, H, W: image shape.

    Returns:
      (gc [C, N] color cotangent into the texture stage,
       dd2 [2, N] masked pair color-dot weights,
       rid2 [2, N] int32 pair table rows (with instance offset),
       ax2 [2, N] untiled aux residuals for the scatter's replay).
    """
    from .antialias import _fold_rolls, _pixel_grid, _roll_next, _roll_prev, \
        decode_aux
    from .texture_pallas import TILE_H, _tile_unorder

    Hp = _cdiv(H, TILE_H) * TILE_H
    Wp = _cdiv(W, LANE) * LANE
    Np = B * Hp * Wp
    al0, ax0, al1, ax1 = (_tile_unorder(a[:Np], B, H, W) for a in al_ax)
    C, N = dy_cm.shape
    _, _, rofs, _, _ = _pixel_grid(B, H, W, T, True)
    nb = _fold_rolls(idf, jnp.zeros_like(idf), B, H, W)

    ccols = [c0_cm[c] for c in range(C)]
    dycols = [dy_cm[c] for c in range(C)]
    gcols = list(dycols)
    dds = []
    rids = []
    for d, (al, ax) in enumerate(((al0, ax0), (al1, ax1))):
        stride = 1 if d == 0 else W
        di, tri1 = decode_aux(ax)
        idf1, _ = nb[d]
        idfs = jnp.where(tri1, idf1, idf)
        tsel = idfs.astype(jnp.int32) - 1
        ok = (al != 0.0) & (tsel >= 0) & (tsel < T)
        tid = jnp.where(ok, tsel, 0)
        rids.append(tid + rofs)

        apos = al > 0
        dd = jnp.zeros((N,), jnp.float32)
        for c in range(C):
            pdy = jnp.where(apos, dycols[c], _roll_prev(dycols[c], stride))
            v = al * pdy
            gcols[c] = gcols[c] - v + _roll_next(v, stride)
            dd = dd + pdy * (_roll_prev(ccols[c], stride) - ccols[c])
        dd = jnp.where(al != 0.0, dd, 0.0)
        # Saturated alpha kills position gradients (antialias.cu:542-546).
        keep = ok & (dd != 0.0) & (jnp.abs(al) < 0.5)
        dds.append(jnp.where(keep, dd, 0.0))

    return (jnp.stack(gcols), jnp.stack(dds), jnp.stack(rids),
            jnp.stack([ax0, ax1]))


# ---------------------------------------------------------------------------
# Fused interpolate + rasterize backward (Pallas).
# ---------------------------------------------------------------------------

def interp_raster_bwd_tex(atbl, vtbl, idf, u, v, gu, gv, gda4, db4,
                          rofs, fx, fy, T, xs_c, ys_c, interpret=False):
    """One pass: interpolate(uv, diff_attrs) bwd + rasterize(db) bwd.

    Args:
      atbl: [6, R+1] uv attribute table (v0u, v0v, v1u, v1v, v2u, v2v;
        dummy zero column last).
      vtbl: [9, R+1] clip-space vertex table ((x, y, w) x 3).
      idf: [N] rast id channel; u, v: [N] barycentrics.
      gu, gv: [N] uv cotangents (from the texture backward).
      gda4: [4, N] uv_da cotangents (from the mip-level chain), order
        (du/dX, du/dY, dv/dX, dv/dY) cotangents per diff attr j:
        (gda_x0, gda_y0, gda_x1, gda_y1).
      db4: [4, N] the rasterizer's db channels (dudx, dudy, dvdx, dvdy).
      rofs: [N] int32 instance table-row offsets, or None.
      fx, fy: [N] clip-space pixel centers (coord.pixel_scale_offset
        convention — matches rasterize._raster_grad_pixel_cols).
      T: triangles.
      xs_c, ys_c: static db image scales (2/W, 2/Hf).

    Returns:
      out [15, N]: rows 0-1 = masked (gu, gv); rows 2-10 = the 9
      vertex-position gradient columns; rows 11-14 = the da attr terms
      (c0_u, c0_v, c1_u, c1_v) for the fused scatter's expansion.
    """
    N = idf.shape[0]
    BLKR = 128
    rows_p = _cdiv(_cdiv(N, LANE), BLKR) * BLKR
    has_rofs = rofs is not None

    atbl3 = _prep_table(atbl)
    vtbl3 = _prep_table(vtbl)
    HI = atbl3.shape[1]
    HIV = vtbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in (idf, u, v, fx, fy)]
    if has_rofs:
        args.append(_flatpad(rofs, rows_p))
    args += [_flatpad(a, rows_p, fill=0.0)
             for a in (jnp.stack([gu, gv]), gda4, db4)]

    def kernel(*refs):
        (atbl_ref, vtbl_ref, i0_ref, u_ref, v_ref, fx_ref, fy_ref) = refs[:7]
        rest = refs[7:]
        if has_rofs:
            ro_ref = rest[0]
            rest = rest[1:]
        (guv_ref, gda_ref, db_ref, out_ref, a6_ref, t9_ref) = rest

        id0 = i0_ref[...]
        ro = ro_ref[...] if has_rofs else 0
        tid0 = id0.astype(jnp.int32) - 1
        valid = (tid0 >= 0) & (tid0 < T)
        rid0v = jnp.where(valid, tid0, 0) + ro
        zero = jnp.zeros(id0.shape, jnp.float32)
        for k in range(15):
            out_ref[k] = zero

        # Background-only blocks emit exact zeros.
        @pl.when(jnp.any(valid))
        def _body():
            _masked_gather(atbl_ref, rid0v, valid, 6,
                           [_Sub(a6_ref, k) for k in range(6)])
            _masked_gather(vtbl_ref, rid0v, valid, 9,
                           [_Sub(t9_ref, k) for k in range(9)])

            gyu = jnp.where(valid, guv_ref[0], 0.0)
            gyv = jnp.where(valid, guv_ref[1], 0.0)
            out_ref[0] = gyu
            out_ref[1] = gyv

            # --- interpolate backward (interpolate.cu:131-274) ----------
            # dummy-row gathers are zero, so gb/dsd vanish off-triangle.
            dsdu0 = a6_ref[0] - a6_ref[4]
            dsdu1 = a6_ref[1] - a6_ref[5]
            dsdv0 = a6_ref[2] - a6_ref[4]
            dsdv1 = a6_ref[3] - a6_ref[5]
            gb0 = gyu * dsdu0 + gyv * dsdu1
            gb1 = gyu * dsdv0 + gyv * dsdv1

            d0 = jnp.where(valid, db_ref[0], 0.0)
            d1 = jnp.where(valid, db_ref[1], 0.0)
            d2 = jnp.where(valid, db_ref[2], 0.0)
            d3 = jnp.where(valid, db_ref[3], 0.0)

            gdb = [zero, zero, zero, zero]
            cda = []
            for j, (dsdu, dsdv) in enumerate(((dsdu0, dsdv0),
                                              (dsdu1, dsdv1))):
                gdax = gda_ref[2 * j]
                gday = gda_ref[2 * j + 1]
                # d(out_da)/d(attr) terms (expanded with the bary outer
                # product in the fused scatter).
                c0 = d0 * gdax + d1 * gday
                c1 = d2 * gdax + d3 * gday
                cda.append(jnp.where(valid, c0, 0.0))
                cda.append(jnp.where(valid, c1, 0.0))
                # d(out_da)/d(rast_db).
                gdb[0] = gdb[0] + gdax * dsdu
                gdb[1] = gdb[1] + gday * dsdu
                gdb[2] = gdb[2] + gdax * dsdv
                gdb[3] = gdb[3] + gday * dsdv
            # cda order: (c0_u, c1_u, c0_v, c1_v) -> emit as
            # (c0_u, c0_v, c1_u, c1_v) in rows 11-14.
            out_ref[11] = cda[0]
            out_ref[12] = cda[2]
            out_ref[13] = cda[1]
            out_ref[14] = cda[3]
            gdb = [jnp.where(valid, c, 0.0) for c in gdb]

            # --- rasterize backward (rasterize.cu:119-273, with db) -----
            x0 = t9_ref[0]
            y0 = t9_ref[1]
            w0 = t9_ref[2]
            x1 = t9_ref[3]
            y1 = t9_ref[4]
            w1 = t9_ref[5]
            x2 = t9_ref[6]
            y2 = t9_ref[7]
            w2 = t9_ref[8]
            fxv = fx_ref[...]
            fyv = fy_ref[...]

            p0x = x0 - fxv * w0
            p0y = y0 - fyv * w0
            p1x = x1 - fxv * w1
            p1y = y1 - fyv * w1
            p2x = x2 - fxv * w2
            p2y = y2 - fyv * w2

            a0 = p1x * p2y - p1y * p2x
            a1 = p2x * p0y - p2y * p0x
            a2 = p0x * p1y - p0y * p1x
            at = a0 + a1 + a2
            ep = jnp.where(at >= 0, 1e-6, -1e-6)
            iw = 1.0 / (at + ep)
            b0 = a0 * iw
            b1 = a1 * iw

            gB0 = gb0 * iw
            gB1 = gb1 * iw
            gbb = gB0 * b0 + gB1 * b1
            gp0x = gbb * (p2y - p1y) - gB1 * p2y
            gp1x = gbb * (p0y - p2y) + gB0 * p2y
            gp2x = gbb * (p1y - p0y) - gB0 * p1y + gB1 * p0y
            gp0y = gbb * (p1x - p2x) + gB1 * p2x
            gp1y = gbb * (p2x - p0x) - gB0 * p2x
            gp2y = gbb * (p0x - p1x) + gB0 * p1x - gB1 * p0x
            gp0w = -fxv * gp0x - fyv * gp0y
            gp1w = -fxv * gp1x - fyv * gp1y
            gp2w = -fxv * gp2x - fyv * gp2y

            dd0, dd1, dd2_, dd3 = gdb
            dfxdX = xs_c * iw
            dfydY = ys_c * iw
            dd0 = dd0 * dfxdX
            dd1 = dd1 * dfydY
            dd2_ = dd2_ * dfxdX
            dd3 = dd3 * dfydY

            da0dX = y1 * w2 - y2 * w1
            da1dX = y2 * w0 - y0 * w2
            da2dX = y0 * w1 - y1 * w0
            da0dY = x2 * w1 - x1 * w2
            da1dY = x0 * w2 - x2 * w0
            da2dY = x1 * w0 - x0 * w1
            datdX = da0dX + da1dX + da2dX
            datdY = da0dY + da1dY + da2dY

            x01 = x0 - x1
            x12 = x1 - x2
            x20 = x2 - x0
            y01 = y0 - y1
            y12 = y1 - y2
            y20 = y2 - y0
            w01 = w0 - w1
            w12 = w1 - w2
            w20 = w2 - w0

            a0p1 = fyv * x2 - fxv * y2
            a0p2 = fxv * y1 - fyv * x1
            a1p0 = fxv * y2 - fyv * x2
            a1p2 = fyv * x0 - fxv * y0

            wdudX = 2.0 * b0 * datdX - da0dX
            wdudY = 2.0 * b0 * datdY - da0dY
            wdvdX = 2.0 * b1 * datdX - da1dX
            wdvdY = 2.0 * b1 * datdY - da1dY

            c0r = iw * (dd0 * wdudX + dd1 * wdudY + dd2_ * wdvdX
                        + dd3 * wdvdY)
            cx = c0r * fxv - dd0 * b0 - dd2_ * b1
            cy = c0r * fyv - dd1 * b0 - dd3 * b1
            cxy = iw * (dd0 * datdX + dd1 * datdY)
            czw = iw * (dd2_ * datdX + dd3 * datdY)

            gp0x = gp0x + c0r * y12 - cy * w12 + czw * p2y + dd3 * w2
            gp1x = gp1x + c0r * y20 - cy * w20 - cxy * p2y - dd1 * w2
            gp2x = (gp2x + c0r * y01 - cy * w01 + cxy * p1y - czw * p0y
                    + dd1 * w1 - dd3 * w0)
            gp0y = gp0y + cx * w12 - c0r * x12 - czw * p2x - dd2_ * w2
            gp1y = gp1y + cx * w20 - c0r * x20 + cxy * p2x + dd0 * w2
            gp2y = (gp2y + cx * w01 - c0r * x01 - cxy * p1x + czw * p0x
                    - dd0 * w1 + dd2_ * w0)
            gp0w = gp0w + cy * x12 - cx * y12 - czw * a1p0 + dd2_ * y2 - dd3 * x2
            gp1w = gp1w + cy * x20 - cx * y20 - cxy * a0p1 - dd0 * y2 + dd1 * x2
            gp2w = (gp2w + cy * x01 - cx * y01 - cxy * a0p2 - czw * a1p2
                    + dd0 * y1 - dd1 * x1 - dd2_ * y0 + dd3 * x0)

            cols = [gp0x, gp0y, gp0w, gp1x, gp1y, gp1w, gp2x, gp2y, gp2w]
            for k in range(9):
                c = cols[k]
                out_ref[2 + k] = jnp.where(valid & jnp.isfinite(c), c, 0.0)

    grid = (rows_p // BLKR,)
    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((15, BLKR, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    atbl_spec = pl.BlockSpec((6, HI, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    vtbl_spec = pl.BlockSpec((9, HIV, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((2, BLKR, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((4, BLKR, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)

    n_flat = 5 + (1 if has_rofs else 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([atbl_spec, vtbl_spec] + [flat_spec] * n_flat
                  + [spec2, spec4, spec4]),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((15, rows_p, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, BLKR, LANE), jnp.float32),
                        pltpu.VMEM((9, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(atbl3, vtbl3, *args)

    return out.reshape(15, rows_p * LANE)[:, :N]
