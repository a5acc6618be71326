"""Fused Pallas kernels for the raster->interpolate->antialias pipeline.

The composed op pipeline runs three kernel families that each re-read
the same per-pixel buffers from HBM, plus XLA glue (channel stacks,
[N, 4] column extracts, [C, N] transposes) between them. These two
kernels collapse everything after the rasterizer sweep:

* ``shade_fwd`` — one pass over the rasterizer's flat channel buffers
  computes the interpolated color (attr-table gather + barycentric
  combine, interpolate.cu:15-126) AND the full antialias pair analysis
  + blend (antialias.cu:165-382) for both axes. Neighbor colors are
  re-interpolated in-kernel from the neighbors' (id, bary) values, so
  the pre-AA color image is never read back from HBM.
* ``pipeline_bwd`` — one pass computes the AA backward (color cross
  gradients + analytic position gradients, antialias.cu:387-556), the
  interpolate backward (attr gradient columns + bary gradients,
  interpolate.cu:131-274), and the rasterize backward (vertex position
  gradients from dL/d(u,v), rasterize.cu:119-273) — the bary gradients
  flow from the interp stage to the raster stage in registers. The
  cross-pixel color-gradient contributions (the ``roll_next`` adds of
  the composed path) are reconstructed locally from backward-shifted
  alpha/dy inputs, so the kernel needs no second pass.

All per-pair/per-pixel math is the SAME shared functions the composed
ops use (antialias.pair_ids/pair_alpha/pair_pos_grad, the interpolate
formulas, the rasterize gradient formulas), guaranteeing bitwise
parity with the composed pipeline.

Per-pixel layout is flat [N] -> [rows, 128] blocks, channel-major for
multi-channel data; per-triangle data are VMEM-resident [K, R] tables
gathered with the active-range chunk sweep of antialias_pallas.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .antialias_pallas import (_Sub, _cdiv, _flatpad, _masked_gather,
                               _prep_table, _roll_next_last, _shifts)

LANE = 128
_MAX_VMEM_TABLE = 1 << 21
_MAX_A = 8  # channel cap (A == C): AA blend + attr combine per channel

# Dev knob (benchmarks/profile_bwdkernel.py): stage names here are
# compiled OUT of pipeline_bwd (zeros written instead) so the kernel's
# per-stage cost can be measured by differencing. Production value is
# the empty set. Stages: 'aa' (pair replay + color grads), 'roll'
# (cross-pixel roll adds), 'interp' (attr-grad rows + bary grads),
# 'raster' (vertex-position rows).
_ABLATE = frozenset()


def supported(A, R):
    """Can the fused pipeline serve this config? (attrs, table rows)."""
    tbl_rows = 3 * A + 7 + 9
    return (A <= _MAX_A
            and tbl_rows * _cdiv(R + 1, LANE) * LANE <= _MAX_VMEM_TABLE)


def _blkr_fwd(A):
    return 256 if A <= 4 else 128


def _blkr_bwd(A):
    return 128


# ---------------------------------------------------------------------------
# Forward: interpolate + antialias in one pass.
# ---------------------------------------------------------------------------

def shade_fwd(atbl, ftable, b0, b1, zw, idf, fx, fy, rofs, bx, by,
              A, T, W, interpret=False):
    """Fused interpolate+antialias forward.

    Args:
      atbl: [3A, R+1] attribute table (dummy zero column last).
      ftable: [7, R+1] AA forward table (antialias._build_tables).
      b0, b1, zw, idf: flat [N] rasterizer channels.
      fx, fy: image-centered pixel coords (antialias._pixel_grid).
      rofs: [N] int32 table-row offset per pixel (instance mode), or
        None when all offsets are zero.
      bx, by: [N] bool border masks (right column / bottom row).
      A: channels; T: triangles; W: image width (roll stride).

    Returns:
      (out [A, N] final color (rolled contributions applied),
       c0 [A, N] pre-AA color,
       (al0, ax0, al1, ax1) flat [N] AA residuals).
    """
    N = idf.shape[0]
    K = 3 * A
    BLKR = _blkr_fwd(A)
    rows_p = _cdiv(_cdiv(N, LANE), BLKR) * BLKR

    from .antialias import pair_ids, pair_alpha

    # Neighbor copies (border-folded ids/z disable the pair; bary
    # neighbor values at borders are garbage but masked by `active`).
    idfx, idfd = _shifts(idf, bx, by, W)
    zx, zd = _shifts(zw, bx, by, W)
    b0x, b0d = _shifts(b0, bx, by, W)
    b1x, b1d = _shifts(b1, bx, by, W)

    has_rofs = rofs is not None
    atbl3 = _prep_table(atbl)
    ftbl3 = _prep_table(ftable)
    HI = atbl3.shape[1]
    HIF = ftbl3.shape[1]
    Rdummy = atbl.shape[1] - 1

    args = [_flatpad(a, rows_p) for a in
            (idf, idfx, idfd, zw, zx, zd, b0, b1, b0x, b0d, b1x, b1d,
             fx, fy)]
    if has_rofs:
        args.append(_flatpad(rofs, rows_p))

    def kernel(*refs):
        (atbl_ref, ftbl_ref, i0_ref, ix_ref, iy_ref, z0_ref, zx_ref,
         zy_ref, b0_ref, b1_ref, b0x_ref, b0y_ref, b1x_ref, b1y_ref,
         fx_ref, fy_ref) = refs[:16]
        rest = refs[16:]
        if has_rofs:
            ro_ref = rest[0]
            rest = rest[1:]
        (out_ref, c0_ref, negx_ref, negy_ref, al0_ref, ax0_ref, al1_ref,
         ax1_ref, g_ref, t7_ref) = rest

        id0 = i0_ref[...]
        zz0 = z0_ref[...]
        fxv = fx_ref[...]
        fyv = fy_ref[...]
        ro = ro_ref[...] if has_rofs else 0

        # --- interpolate: own-pixel color -------------------------------
        tid0 = id0.astype(jnp.int32) - 1
        valid = (tid0 >= 0) & (tid0 < T)
        rid0 = jnp.where(valid, tid0, 0) + ro
        zero = jnp.zeros(id0.shape, jnp.float32)
        for a in range(A):
            c0_ref[a] = zero
            out_ref[a] = zero

        # Background-only blocks (no covered pixel) write exact zeros;
        # skip the gather + combine outright.
        @pl.when(jnp.any(valid))
        def _interp():
            _masked_gather(atbl_ref, rid0, valid, K,
                           [_Sub(g_ref, k) for k in range(K)])
            bb0 = jnp.where(valid, b0_ref[...], 0.0)
            bb1 = jnp.where(valid, b1_ref[...], 0.0)
            bb2 = jnp.where(valid, 1.0 - b0_ref[...] - b1_ref[...], 0.0)
            for a in range(A):
                c0 = (bb0 * g_ref[a] + bb1 * g_ref[A + a]
                      + bb2 * g_ref[2 * A + a])
                c0_ref[a] = c0
                out_ref[a] = c0

        # --- antialias: both axes ---------------------------------------
        for d, (i1_ref, z1_ref, b0n_ref, b1n_ref, neg_ref, al_ref,
                ax_ref) in enumerate(
                ((ix_ref, zx_ref, b0x_ref, b1x_ref, negx_ref, al0_ref,
                  ax0_ref),
                 (iy_ref, zy_ref, b0y_ref, b1y_ref, negy_ref, al1_ref,
                  ax1_ref))):
            id1 = i1_ref[...]
            tid, is_t1, active = pair_ids(id0, id1, zz0, z1_ref[...], T)
            for a in range(A):
                neg_ref[a] = zero
            al_ref[...] = zero
            ax_ref[...] = zero

            # Pair analysis only where the block actually contains a
            # discontinuity (alpha = 0 elsewhere; aux is consumed only
            # where al != 0) — same guard as aa_forward_fused.
            @pl.when(jnp.any(active))
            def _analysis(d=d, b0n_ref=b0n_ref, b1n_ref=b1n_ref,
                          neg_ref=neg_ref, al_ref=al_ref, ax_ref=ax_ref,
                          id1=id1, tid=tid, is_t1=is_t1, active=active):
                rid = tid + ro
                _masked_gather(ftbl_ref, rid, active,
                               7, [_Sub(t7_ref, k) for k in range(7)])
                t7v = [t7_ref[k] for k in range(7)]
                alpha, di = pair_alpha(t7v, fxv, fyv, is_t1, active, d)

                # Neighbor color: re-interpolate from the neighbor's
                # (id, bary) — exactly the rolled color of the composed
                # path (the neighbor pixel's own interpolation result).
                tid1 = id1.astype(jnp.int32) - 1
                nvalid = (tid1 >= 0) & (tid1 < T)
                rid1 = jnp.where(nvalid, tid1, 0) + ro
                _masked_gather(atbl_ref, rid1, active & nvalid, K,
                               [_Sub(g_ref, k) for k in range(K)])
                nb0 = jnp.where(nvalid, b0n_ref[...], 0.0)
                nb1 = jnp.where(nvalid, b1n_ref[...], 0.0)
                nb2 = jnp.where(nvalid, 1.0 - b0n_ref[...] - b1n_ref[...],
                                0.0)

                apos = alpha > 0
                for a in range(A):
                    c1 = (nb0 * g_ref[a] + nb1 * g_ref[A + a]
                          + nb2 * g_ref[2 * A + a])
                    contrib = alpha * (c1 - c0_ref[a])
                    out_ref[a] = out_ref[a] + jnp.where(apos, contrib, 0.0)
                    neg_ref[a] = jnp.where(apos, 0.0, contrib)
                al_ref[...] = alpha
                ax_ref[...] = (di.astype(jnp.float32)
                               + 4.0 * is_t1.astype(jnp.float32))

    grid = (rows_p // BLKR,)
    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((A, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    atbl_spec = pl.BlockSpec((K, HI, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    ftbl_spec = pl.BlockSpec((7, HIF, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    n_flat_in = 14 + (1 if has_rofs else 0)
    out_shapes = (
        [jax.ShapeDtypeStruct((A, rows_p, LANE), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((rows_p, LANE), jnp.float32)] * 4)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[atbl_spec, ftbl_spec] + [flat_spec] * n_flat_in,
        out_specs=[chan_spec] * 4 + [flat_spec] * 4,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K, BLKR, LANE), jnp.float32),
                        pltpu.VMEM((7, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(atbl3, ftbl3, *args)

    out_k, c0_k, negx, negy, al0, ax0, al1, ax1 = outs

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    out = unflat(out_k)
    out = out + _roll_next_last(unflat(negx), 1)
    out = out + _roll_next_last(unflat(negy), W)
    c0 = unflat(c0_k)
    res = tuple(unflat(a) for a in (al0, ax0, al1, ax1))
    return out, c0, res


# ---------------------------------------------------------------------------
# Backward: antialias + interpolate + rasterize in one pass.
# ---------------------------------------------------------------------------

def pipeline_bwd(atbl, vtbl, b0, b1, idf, fx, fy, rofs, bx, by,
                 dy_cols, c0_cols, residuals, A, T, W, Hf, xs, ys,
                 interpret=False):
    """Fused backward for the 3-op pipeline.

    Args:
      atbl: [3A, R+1] attribute table.
      vtbl: [9, R+1] clip-space vertex table ((x, y, w) x 3) — serves
        both the AA backward (btable) and the rasterize backward.
      b0, b1, idf: flat [N] rasterizer channels.
      fx, fy: image-centered pixel coords; the rasterize stage rescales
        them to clip space via (xs, ys) = (2/W, 2/Hf).
      dy_cols: [A] list of flat [N] loss-gradient columns.
      c0_cols: [A] list of flat [N] pre-AA color columns (fwd residual).
      residuals: (al0, ax0, al1, ax1) AA forward residuals.

    Returns:
      (gs [A+9, N]: final color-gradient rows (post-AA, masked by
       validity) then the rasterize vertex-pos columns, keyed by the
       pixel's own rid;
       dd2 [2, N]: per-axis masked AA color-dot weights;
       rid2 [2, N] int32: per-axis pair triangle rows).
      The bb-outer-product attr expansion and the AA pair_pos_grad
      replay happen inside pipeline_grad_scatter — this kernel emits
      17 rows instead of 41.
    """
    from .antialias import decode_aux

    (al0, ax0, al1, ax1) = residuals
    N = idf.shape[0]
    K = 3 * A
    BLKR = _blkr_bwd(A)
    rows_p = _cdiv(_cdiv(N, LANE), BLKR) * BLKR
    has_rofs = rofs is not None

    idfx, idfd = _shifts(idf, bx, by, W)
    c0t = jnp.stack(c0_cols)  # [A, N]
    dyt = jnp.stack(dy_cols)
    c0x, c0d = _shifts(c0t, bx, by, W)
    dyx, dyd = _shifts(dyt, bx, by, W)
    dym1 = _roll_next_last(dyt, 1)
    dymW = _roll_next_last(dyt, W)
    al0m = _roll_next_last(al0[None], 1)[0]
    al1m = _roll_next_last(al1[None], W)[0]

    atbl3 = _prep_table(atbl)
    vtbl3 = _prep_table(vtbl)
    HI = atbl3.shape[1]
    HIV = vtbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in (idf, idfx, idfd, b0, b1, fx, fy)]
    if has_rofs:
        args.append(_flatpad(rofs, rows_p))
    # Residual padding must be inactive, not edge-replicated.
    args += [_flatpad(al0, rows_p, fill=0.0), _flatpad(ax0, rows_p),
             _flatpad(al1, rows_p, fill=0.0), _flatpad(ax1, rows_p),
             _flatpad(al0m, rows_p, fill=0.0),
             _flatpad(al1m, rows_p, fill=0.0)]
    args += [_flatpad(a, rows_p, fill=0.0)
             for a in (c0t, c0x, c0d, dyt, dyx, dyd, dym1, dymW)]

    def kernel(*refs):
        i = 0
        atbl_ref = refs[i]; i += 1
        vtbl_ref = refs[i]; i += 1
        i0_ref = refs[i]; i += 1
        ix_ref = refs[i]; i += 1
        iy_ref = refs[i]; i += 1
        b0_ref = refs[i]; i += 1
        b1_ref = refs[i]; i += 1
        fx_ref = refs[i]; i += 1
        fy_ref = refs[i]; i += 1
        if has_rofs:
            ro_ref = refs[i]; i += 1
        al0_ref = refs[i]; i += 1
        ax0_ref = refs[i]; i += 1
        al1_ref = refs[i]; i += 1
        ax1_ref = refs[i]; i += 1
        al0m_ref = refs[i]; i += 1
        al1m_ref = refs[i]; i += 1
        c0_ref = refs[i]; i += 1
        c0x_ref = refs[i]; i += 1
        c0y_ref = refs[i]; i += 1
        dy0_ref = refs[i]; i += 1
        dyx_ref = refs[i]; i += 1
        dyy_ref = refs[i]; i += 1
        dym1_ref = refs[i]; i += 1
        dymW_ref = refs[i]; i += 1
        gs_ref = refs[i]; i += 1
        dd_ref = refs[i]; i += 1
        rid0_ref = refs[i]; i += 1
        rid1_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1
        t9_ref = refs[i]

        id0 = i0_ref[...]
        fxv = fx_ref[...]
        fyv = fy_ref[...]
        ro = ro_ref[...] if has_rofs else 0
        c0 = [c0_ref[c] for c in range(A)]
        dy0 = [dy0_ref[c] for c in range(A)]

        # --- AA backward (antialias.cu:387-556) -------------------------
        # The pair replay's analytic position gradients moved into the
        # fused gradient scatter (pipeline_grad_scatter): this kernel
        # only emits the masked color-dot weight dd per axis — 2 rows
        # instead of 2x(9 + rid), and no vtbl gather here.
        gc = [dy0[c] for c in range(A)]  # running g_color per channel
        zero = jnp.zeros(id0.shape, jnp.float32)
        for d, (i1_ref, c1_ref, dy1_ref, rid_ref, al_ref,
                ax_ref) in enumerate(
                ((ix_ref, c0x_ref, dyx_ref, rid0_ref, al0_ref,
                  ax0_ref),
                 (iy_ref, c0y_ref, dyy_ref, rid1_ref, al1_ref,
                  ax1_ref))):
            al = al_ref[...]
            apos = al > 0
            rid_ref[...] = ro + jnp.zeros(id0.shape, jnp.int32)
            dd_ref[d] = zero
            if "aa" in _ABLATE:
                continue
            # Color-gradient update is cheap elementwise and exact (an
            # identity where al == 0); only the pair bookkeeping is
            # guarded on block activity.
            pdy = [jnp.where(apos, dy0[c], dy1_ref[c]) for c in range(A)]
            for c in range(A):
                gc[c] = gc[c] - al * pdy[c]

            # Silhouette pairs are sparse: blocks whose recorded alpha
            # is all-zero contribute exact zeros — skip the bookkeeping.
            @pl.when(jnp.any(al != 0.0))
            def _replay(d=d, i1_ref=i1_ref, c1_ref=c1_ref, pdy=pdy,
                        rid_ref=rid_ref, al=al, ax_ref=ax_ref):
                _di, is_t1 = decode_aux(ax_ref[...])
                active = al != 0.0
                idfs = jnp.where(is_t1, i1_ref[...], id0)
                tsel = idfs.astype(jnp.int32) - 1
                ok = active & (tsel >= 0) & (tsel < T)
                tid = jnp.where(ok, tsel, 0)
                rid_ref[...] = tid + ro

                dd = jnp.zeros_like(al)
                for c in range(A):
                    dd = dd + pdy[c] * (c1_ref[c] - c0[c])
                dd = jnp.where(active, dd, 0.0)
                keep = ok & (dd != 0.0) & (jnp.abs(al) < 0.5)
                dd_ref[d] = jnp.where(keep, dd, 0.0)

        # Cross-pixel roll contributions reconstructed locally from
        # backward-shifted alpha/dy: v[p - s] depends only on
        # alpha[p - s] and (dy[p - s], dy[p]). Addition order matches
        # the composed path: ((dy - v0) - v1) + roll(v0) + roll(v1).
        if "roll" not in _ABLATE:
            a0m = al0m_ref[...]
            a1m = al1m_ref[...]
            for c in range(A):
                vm0 = a0m * jnp.where(a0m > 0, dym1_ref[c], dy0[c])
                vm1 = a1m * jnp.where(a1m > 0, dymW_ref[c], dy0[c])
                gc[c] = gc[c] + vm0 + vm1

        # --- interpolate backward (interpolate.cu:131-274) --------------
        # Only the A final color-gradient rows are emitted (masked by
        # validity); the fused gradient scatter expands them with the
        # barycentric outer product (bb0, bb1, 1-b0-b1 come from the
        # rasterizer's own buffers there).
        tid0 = id0.astype(jnp.int32) - 1
        valid = (tid0 >= 0) & (tid0 < T)
        rid0v = jnp.where(valid, tid0, 0) + ro
        for k in range(A + 9):
            gs_ref[k] = zero

        # Background-only blocks produce exact zero gradient rows.
        @pl.when(jnp.any(valid))
        def _grad_body():
            gb0 = zero
            gb1 = zero
            if "interp" not in _ABLATE:
                _masked_gather(atbl_ref, rid0v, valid, K,
                               [_Sub(g_ref, k) for k in range(K)])
                for a in range(A):
                    gb0 = gb0 + gc[a] * (g_ref[a] - g_ref[2 * A + a])
                    gb1 = gb1 + gc[a] * (g_ref[A + a] - g_ref[2 * A + a])
                for a in range(A):
                    gs_ref[a] = jnp.where(valid, gc[a], 0.0)

            if "raster" in _ABLATE:
                return
            # --- rasterize backward (rasterize.cu:119-273, no db) -------
            _masked_gather(vtbl_ref, rid0v, valid,
                           9, [_Sub(t9_ref, k) for k in range(9)])
            x0 = t9_ref[0]
            y0 = t9_ref[1]
            w0 = t9_ref[2]
            x1 = t9_ref[3]
            y1 = t9_ref[4]
            w1 = t9_ref[5]
            x2 = t9_ref[6]
            y2 = t9_ref[7]
            w2 = t9_ref[8]

            fxc = fxv * xs  # image-centered pixel units -> clip space
            fyc = fyv * ys
            p0x = x0 - fxc * w0
            p0y = y0 - fyc * w0
            p1x = x1 - fxc * w1
            p1y = y1 - fyc * w1
            p2x = x2 - fxc * w2
            p2y = y2 - fyc * w2

            a0 = p1x * p2y - p1y * p2x
            a1 = p2x * p0y - p2y * p0x
            a2 = p0x * p1y - p0y * p1x
            at = a0 + a1 + a2
            ep = jnp.where(at >= 0, 1e-6, -1e-6)
            iw = 1.0 / (at + ep)
            rb0 = a0 * iw
            rb1 = a1 * iw

            gB0 = gb0 * iw
            gB1 = gb1 * iw
            gbb = gB0 * rb0 + gB1 * rb1
            gp0x = gbb * (p2y - p1y) - gB1 * p2y
            gp1x = gbb * (p0y - p2y) + gB0 * p2y
            gp2x = gbb * (p1y - p0y) - gB0 * p1y + gB1 * p0y
            gp0y = gbb * (p1x - p2x) + gB1 * p2x
            gp1y = gbb * (p2x - p0x) - gB0 * p2x
            gp2y = gbb * (p0x - p1x) + gB0 * p1x - gB1 * p0x
            gp0w = -fxc * gp0x - fyc * gp0y
            gp1w = -fxc * gp1x - fyc * gp1y
            gp2w = -fxc * gp2x - fyc * gp2y

            cols = [gp0x, gp0y, gp0w, gp1x, gp1y, gp1w, gp2x, gp2y, gp2w]
            for k in range(9):
                v = cols[k]
                gs_ref[A + k] = jnp.where(valid & jnp.isfinite(v), v, 0.0)

    grid = (rows_p // BLKR,)
    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((A, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    gs_spec = pl.BlockSpec((A + 9, BLKR, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    dd_spec = pl.BlockSpec((2, BLKR, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    atbl_spec = pl.BlockSpec((K, HI, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    vtbl_spec = pl.BlockSpec((9, HIV, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    n_flat = 13 + (1 if has_rofs else 0)
    out_shapes = (
        [jax.ShapeDtypeStruct((A + 9, rows_p, LANE), jnp.float32),
         jax.ShapeDtypeStruct((2, rows_p, LANE), jnp.float32)]
        + [jax.ShapeDtypeStruct((rows_p, LANE), jnp.int32)] * 2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([atbl_spec, vtbl_spec] + [flat_spec] * n_flat
                  + [chan_spec] * 8),
        out_specs=[gs_spec, dd_spec] + [flat_spec] * 2,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K, BLKR, LANE), jnp.float32),
                        pltpu.VMEM((9, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(atbl3, vtbl3, *args)

    gs, dd2, rid0, rid1 = outs

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    return (unflat(gs), unflat(dd2),
            jnp.stack([unflat(rid0), unflat(rid1)]))



# ---------------------------------------------------------------------------
# Fused gradient scatter: expand + reduce in one MXU pass.
# ---------------------------------------------------------------------------

def pipeline_grad_scatter(rid0v, gs, dd2, rid2, b0, b1, ax0, ax1, vtbl,
                          A, R, W, Hf, da4=None, interpret=False):
    """One windowed one-hot MXU scatter for ALL pipeline gradients.

    Replaces two generic scatter_add_by_id calls over 41 emitted rows
    with one pass over the 17 slim rows pipeline_bwd now emits: the
    barycentric outer product (attr rows) is expanded in-kernel from
    the rasterizer's own b0/b1 buffers, and the AA analytic position
    gradients are replayed in-kernel per one-hot window — the t9
    vertex gather rides the SAME one-hot matmul the scatter already
    builds (rows outside the window read zeros; pair_pos_grad's
    isfinite filter drops the resulting poles, and their one-hot
    columns are zero anyway). ~680 MB less HBM stream traffic per
    step at 2048^2.

    Args:
      rid0v: [N] int32 own-pixel table rows (invalid pixels -> any row
        in range; their gs rows are zero).
      gs: [A+9, N] pipeline_bwd's slim stream (gc rows + raster pos).
      dd2: [2, N] masked AA color-dot weights; rid2 [2, N] int32.
      b0, b1: [N] rasterizer barycentric buffers (bb2 = 1 - b0 - b1).
      ax0, ax1: [N] AA aux residuals (di + 4*is_t1).
      vtbl: [9, R] clip-space vertex table (w-rows strictly nonzero
        for real triangles).
      A: channels; R: table rows; W/Hf: image dims (fx/fy recompute,
        antialias._pixel_grid convention).
      da4: optional [4, N] diff-attr terms (c0_u, c0_v, c1_u, c1_v)
        from the textured pipeline's interpolate(diff_attrs) backward
        (requires A == 2): attr row j of vertex 0/1/2 becomes
        bb0*g_j + c0_j / bb1*g_j + c1_j / bb2*g_j - c0_j - c1_j
        (interpolate.cu:131-274's Da terms).

    Returns:
      (gt [R, 3A+9] attr+raster rows, gaa [R, 9] AA position rows —
       kept separate for pos_gradient_boost).
    """
    from .antialias import decode_aux, pair_pos_grad

    K = 3 * A
    N = rid0v.shape[0]
    P = 8192
    n_chunks = _cdiv(N, P)
    Np = n_chunks * P
    FK = K + 9 + 9  # attr + raster + AA rows of the accumulator

    def padN(x):
        if Np != N:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Np - N)])
        return x

    has_da = da4 is not None
    if has_da:
        assert A == 2, "da4 expansion is defined for uv attrs (A == 2)"
    ints = padN(jnp.stack([rid0v, rid2[0], rid2[1]]))      # [3, Np]
    gsp = padN(gs)                                         # [A+9, Np]
    dds = padN(dd2)                                        # [2, Np]
    fl_rows = [b0, b1, ax0, ax1]
    if has_da:
        fl_rows += [da4[0], da4[1], da4[2], da4[3]]
    NF = len(fl_rows)
    flts = padN(jnp.stack(fl_rows))                        # [NF, Np]

    Rp = max(_cdiv(R, LANE) * LANE, LANE)
    vt_p = jnp.pad(vtbl, ((0, 0), (0, Rp - vtbl.shape[1])))  # [9, Rp]
    n_win = Rp // LANE

    fx_off = float(0.5 - 0.5 * W)
    fy_off = float(0.5 - 0.5 * Hf)
    dn = (((1,), (1,)), ((), ()))

    def kernel(vt_ref, ints_ref, gs_ref, dd_ref, fl_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[...] = jnp.zeros((FK, Rp), jnp.float32)

        def windows(q, live):
            big = jnp.int32(1 << 30)
            w_lo = jnp.min(jnp.where(live, q, big)) // LANE
            w_hi = jnp.max(jnp.where(live, q, -1)) // LANE
            return jnp.where(live, q, Rp + LANE), w_lo, w_hi

        def hilo_update(ve, oht, row0, nrows, w):
            ve_hi = ve.astype(jnp.bfloat16)
            ve_lo = (ve - ve_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            stack = jnp.concatenate([ve_hi, ve_lo], axis=0)
            both = jax.lax.dot_general(
                stack, oht, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            upd = both[:nrows] + both[nrows:]
            dsw = pl.ds(pl.multiple_of(w * LANE, LANE), LANE)
            out_ref[row0:row0 + nrows, dsw] += upd

        # --- own-pixel pass: attr outer product + raster rows -------
        qo = ints_ref[0:1]  # [1, P]
        live_o = jnp.zeros(qo.shape, bool)
        for k in range(A + 9):
            live_o = live_o | (gs_ref[k:k + 1] != 0.0)
        if has_da:
            for k in range(4):
                live_o = live_o | (fl_ref[4 + k:5 + k] != 0.0)

        @pl.when(jnp.any(live_o))
        def _own():
            bb0 = fl_ref[0:1]
            bb1 = fl_ref[1:2]
            bb2 = 1.0 - bb0 - bb1
            gcv = [gs_ref[a:a + 1] for a in range(A)]
            if has_da:
                cc = [fl_ref[4 + k:5 + k] for k in range(4)]
                rows = ([bb0 * gcv[j] + cc[j] for j in range(2)]
                        + [bb1 * gcv[j] + cc[2 + j] for j in range(2)]
                        + [bb2 * gcv[j] - cc[j] - cc[2 + j]
                           for j in range(2)]
                        + [gs_ref[A + k:A + k + 1] for k in range(9)])
            else:
                rows = ([bb0 * g for g in gcv] + [bb1 * g for g in gcv]
                        + [bb2 * g for g in gcv]
                        + [gs_ref[A + k:A + k + 1] for k in range(9)])
            ve = jnp.concatenate([r for r in rows], axis=0)  # [K+9, P]
            ql, w_lo, w_hi = windows(qo, live_o)

            def wbody(w, carry):
                @pl.when(jnp.any(ql // LANE == w))
                def _do():
                    rr = jax.lax.broadcasted_iota(jnp.int32,
                                                  (LANE, P), 0)
                    oht = (rr == (ql - w * LANE)).astype(jnp.bfloat16)
                    hilo_update(ve, oht, 0, K + 9, w)
                return carry

            jax.lax.fori_loop(w_lo, w_hi + 1, wbody, 0)

        # --- AA axis passes: per-window pair_pos_grad replay ---------
        # fx/fy from the flat pixel index (antialias._pixel_grid).
        pix = (c * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1))
        colp = pix % W
        rowp = (pix // W) % Hf
        fxv = colp.astype(jnp.float32) + fx_off
        fyv = rowp.astype(jnp.float32) + fy_off

        for d in range(2):
            ddv = dd_ref[d:d + 1]
            act = ddv != 0.0

            @pl.when(jnp.any(act))
            def _axis(d=d, ddv=ddv, act=act):
                qd = ints_ref[1 + d:2 + d]
                di, is_t1 = decode_aux(fl_ref[2 + d:3 + d])
                ql, w_lo, w_hi = windows(qd, act)

                def wbody(w, carry):
                    @pl.when(jnp.any(ql // LANE == w))
                    def _do():
                        rr = jax.lax.broadcasted_iota(jnp.int32,
                                                      (LANE, P), 0)
                        sel = rr == (ql - w * LANE)
                        oht = sel.astype(jnp.bfloat16)
                        # t9 gather through the same one-hot (f32
                        # accuracy: HIGHEST = bf16x6 passes on a tiny
                        # [9, 128] x [128, P] product).
                        dsw = pl.ds(pl.multiple_of(w * LANE, LANE),
                                    LANE)
                        vt_win = vt_ref[:, dsw]  # [9, LANE]
                        t9g = jax.lax.dot_general(
                            vt_win, sel.astype(jnp.float32),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        t9v = [t9g[k:k + 1] for k in range(9)]
                        cols = pair_pos_grad(t9v, ddv, act, di, is_t1,
                                             fxv, fyv, d, W, Hf)
                        ve = jnp.concatenate(cols, axis=0)  # [9, P]
                        hilo_update(ve, oht, K + 9, 9, w)
                    return carry

                jax.lax.fori_loop(w_lo, w_hi + 1, wbody, 0)

    grid = (n_chunks,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, Rp), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A + 9, P), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, P), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FK, Rp), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FK, Rp), jnp.float32),
        interpret=interpret,
    )(vt_p, ints, gsp, dds, flts)

    gt = out[:K + 9, :R].T
    gaa = out[K + 9:, :R].T
    return gt, gaa
