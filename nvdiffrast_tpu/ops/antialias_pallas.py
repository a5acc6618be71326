"""Fused Pallas TPU kernels for the antialias op.

One kernel per pass replaces the XLA path's separate table gathers,
rolls, and ~50 elementwise sweeps (see antialias.py): neighbor values
are pre-resolved into shifted copies by XLA (cheap contiguous copies),
and the kernel does id decode, the per-triangle table gather, the
full pair analysis, and the color blending for both axes in VMEM.

The gather is the table_take pattern (ops/gather.py): decompose id
into (chunk, lane), sweep chunks with lane-wise dynamic gathers. The
crucial difference: the sweep range is computed **only over active
pixels** (pair boundaries) — a handful per block — instead of all
pixels, whose empty-background ids would drag every block's range
down to chunk 0.

The pair analysis itself is the *shared* pointwise math from
antialias.py (pair_ids / pair_alpha / pair_pos_grad), so the fused
path is exactly the XLA path's arithmetic, reordered.

Cross-pixel output scatter (the blend contribution a pair writes onto
its *neighbor*) leaves the kernel as a separate "neg" image that XLA
shifts and adds — keeping every kernel write block-aligned.

Reference: csrc/common/antialias.cu:165-556.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_MAX_VMEM_TABLE = 1 << 21  # table floats kept in VMEM (8 MB f32)
_MAX_CHANNELS = 8


def _cdiv(a, b):
    return -(-a // b)


def supported(C, R):
    """Can the fused path serve this config? (channels, table rows)."""
    return C <= _MAX_CHANNELS and 9 * _cdiv(R + 1, LANE) * LANE <= _MAX_VMEM_TABLE


def _blkr(C):
    # Rows per block = one 64x128 image tile: pixels are reordered
    # tile-major (texture_pallas._tile_order) so silhouette crossings
    # cluster in a few blocks and the per-block any-hit guards skip
    # the pair analysis everywhere else (a flat row-major block spans
    # the full image width and almost always crosses a silhouette).
    del C
    return 64


def _masked_gather(tbl_ref, rid, active, nk, out_refs):
    """out_refs[k][...] = tbl[k, rid] for active pixels (others zero).

    Sweeps only the id-chunk range of *active* lanes; blocks with no
    active pixel skip the sweep entirely.
    """
    shape = rid.shape
    hi = rid >> 7
    lo = rid & 127
    big = jnp.int32(1 << 30)
    h_lo = jnp.min(jnp.where(active, hi, big))
    h_hi = jnp.max(jnp.where(active, hi, -1))

    for k in range(nk):
        out_refs[k][...] = jnp.zeros(shape, jnp.float32)

    def hbody(h, _):
        mask = (hi == h) & active
        for k in range(nk):
            row = tbl_ref[k, h, :]
            chunk = jnp.broadcast_to(row[None, :], shape)
            g = jnp.take_along_axis(chunk, lo, axis=1)
            out_refs[k][...] = jnp.where(mask, g, out_refs[k][...])
        return _

    jax.lax.fori_loop(h_lo, h_hi + 1, hbody, 0)


def _flatpad(x, rows_p, fill=None):
    """[N] -> [rows_p, 128], edge-padded (keeps padded ids coherent)."""
    n = x.shape[-1]
    npad = rows_p * LANE - n
    if npad:
        if fill is None:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (npad,))],
                axis=-1)
        else:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, npad)],
                        constant_values=fill)
    return x.reshape(x.shape[:-1] + (rows_p, LANE))


def _prep_table(tbl):
    """[K, R] -> [K, HI, 128] zero-padded."""
    K, R = tbl.shape
    Rp = _cdiv(R, LANE) * LANE
    if Rp != R:
        tbl = jnp.pad(tbl, ((0, 0), (0, Rp - R)))
    return tbl.reshape(K, Rp // LANE, LANE)


def _roll_next_last(x, stride):
    """Scatter from p onto p + stride along the last (pixel) axis."""
    z = jnp.zeros(x.shape[:-1] + (stride,), x.dtype)
    return jnp.concatenate([z, x[..., :-stride]], axis=-1)


def _shifts(x, bx, by, W):
    """Border-folded neighbor copies for both axes. x: [..., N]."""
    def prev(a, s):
        return jnp.concatenate([a[..., s:], a[..., -s:]], axis=-1)

    xr = jnp.where(bx, x, prev(x, 1))
    xd = jnp.where(by, x, prev(x, W))
    return xr, xd


def _grids(B, H, W, T, instance_mode, viewport=None):
    from .antialias import _pixel_grid

    return _pixel_grid(B, H, W, T, instance_mode, viewport)


# ---------------------------------------------------------------------------
# Forward.
# ---------------------------------------------------------------------------

def aa_forward_fused(color, rast, ftable, T, instance_mode, interpret=False,
                     viewport=None):
    """Fused AA forward (NHWC boundary).

    Returns (out [B, H, W, C], residuals (al0, aux0, al1, aux1),
    tile-ordered)."""
    B, H, W, C = color.shape
    N = B * H * W
    rflat = rast.reshape(N, 4)
    return aa_forward_fused_cols(
        color.reshape(N, C).T, rflat[:, 3], rflat[:, 2], ftable, T,
        instance_mode, (B, H, W, C), interpret=interpret,
        viewport=viewport)


def aa_forward_fused_cols(ct, idf0, z0, ftable, T, instance_mode, shape,
                          interpret=False, viewport=None):
    """Fused AA forward on flat channel-major inputs.

    ct: [C, N]; idf0, z0: [N] rast id/depth channels; shape: (B, H, W,
    C). Returns (out [B, H, W, C], residuals (al0, aux0, al1, aux1)
    flat tile-ordered)."""
    from .antialias import pair_ids, pair_alpha

    B, H, W, C = shape
    N = B * H * W
    BLKR = _blkr(C)

    fx, fy, rofs, bx, by = _grids(B, H, W, T, instance_mode, viewport)

    idfx, idfd = _shifts(idf0, bx, by, W)
    zx, zd = _shifts(z0, bx, by, W)
    cx, cd = _shifts(ct, bx, by, W)

    # Neighbor shifts happen in row-major space (above); the kernel
    # streams are then regrouped into 64x128 image tiles so each block
    # sees a compact screen region (see _blkr). Residuals are returned
    # in tile order — the backward consumes them as-is.
    from .texture_pallas import _tile_order
    to = lambda a: _tile_order(a, B, H, W)  # noqa: E731
    idf0, idfx, idfd, z0, zx, zd, fx, fy, rofs = (
        to(a) for a in (idf0, idfx, idfd, z0, zx, zd, fx, fy, rofs))
    ct_t, cx, cd = (to(a) for a in (ct, cx, cd))
    Np = idf0.shape[-1]
    rows_p = _cdiv(_cdiv(Np, LANE), BLKR) * BLKR

    tbl3 = _prep_table(ftable)
    HI = tbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in
            (idf0, idfx, idfd, z0, zx, zd, fx, fy, rofs)]
    cargs = [_flatpad(a, rows_p) for a in (ct_t, cx, cd)]

    def kernel(tbl_ref, i0_ref, ix_ref, iy_ref, z0_ref, zx_ref, zy_ref,
               fx_ref, fy_ref, ro_ref, c0_ref, cx_ref, cy_ref,
               out_ref, negx_ref, negy_ref, al0_ref, ax0_ref, al1_ref,
               ax1_ref, t7):
        id0 = i0_ref[...]
        zz0 = z0_ref[...]
        fxv = fx_ref[...]
        fyv = fy_ref[...]
        ro = ro_ref[...]
        c0 = [c0_ref[c] for c in range(C)]
        for c in range(C):
            out_ref[c] = c0[c]

        for d, (i1_ref, z1_ref, c1_ref, neg_ref, al_ref, ax_ref) in enumerate(
                ((ix_ref, zx_ref, cx_ref, negx_ref, al0_ref, ax0_ref),
                 (iy_ref, zy_ref, cy_ref, negy_ref, al1_ref, ax1_ref))):
            id1 = i1_ref[...]
            tid, is_t1, active = pair_ids(id0, id1, zz0, z1_ref[...], T)
            zero = jnp.zeros(id0.shape, jnp.float32)
            for c in range(C):
                neg_ref[c] = zero
            al_ref[...] = zero
            ax_ref[...] = zero

            # Pair analysis only where the block actually contains a
            # discontinuity: pairs are silhouette-sparse and pixels are
            # tile-ordered, so most blocks skip everything (alpha = 0
            # everywhere in them; aux is consumed only where al != 0).
            @pl.when(jnp.any(active))
            def _analysis(d=d, c1_ref=c1_ref, neg_ref=neg_ref,
                          al_ref=al_ref, ax_ref=ax_ref, tid=tid,
                          is_t1=is_t1, active=active):
                rid = tid + ro
                _masked_gather(tbl_ref, rid, active,
                               7, [_Sub(t7, k) for k in range(7)])
                t7v = [t7[k] for k in range(7)]
                alpha, di = pair_alpha(t7v, fxv, fyv, is_t1, active, d)
                apos = alpha > 0
                for c in range(C):
                    contrib = alpha * (c1_ref[c] - c0[c])
                    out_ref[c] = out_ref[c] + jnp.where(apos, contrib, 0.0)
                    neg_ref[c] = jnp.where(apos, 0.0, contrib)
                al_ref[...] = alpha
                ax_ref[...] = (di.astype(jnp.float32)
                               + 4.0 * is_t1.astype(jnp.float32))

    grid = (rows_p // BLKR,)
    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((C, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((7, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((rows_p, LANE), jnp.float32)] * 4)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tbl_spec] + [flat_spec] * 9 + [chan_spec] * 3,
        out_specs=[chan_spec] * 3 + [flat_spec] * 4,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((7, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(tbl3, *args, *cargs)

    out_k, negx, negy, al0, ax0, al1, ax1 = outs
    from .texture_pallas import _tile_unorder

    def unflat(a):
        # kernel layout [.., rows_p, 128] -> tile stream -> row-major [N]
        flat = a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :Np]
        return _tile_unorder(flat, B, H, W)

    out = unflat(out_k)  # [C, N]
    out = out + _roll_next_last(unflat(negx), 1)
    out = out + _roll_next_last(unflat(negy), W)
    out = out.T.reshape(B, H, W, C)
    # Residuals stay in the kernel's padded tile order; the fused
    # backward consumes them directly. NOTE: tile padding replicates
    # edge pixels, so padding lanes CAN carry al != 0 — every consumer
    # must strip padding (tile_unorder) before anything that sums or
    # scatters, as the backward does.
    res = tuple(a.reshape(rows_p * LANE) for a in (al0, ax0, al1, ax1))
    return out, res


class _Sub:
    """ref[k] view helper so _masked_gather can write 3-D scratch rows."""

    def __init__(self, ref, k):
        self.ref = ref
        self.k = k

    def __getitem__(self, idx):
        return self.ref[self.k]

    def __setitem__(self, idx, val):
        self.ref[self.k] = val


# ---------------------------------------------------------------------------
# Backward.
# ---------------------------------------------------------------------------

def aa_backward_fused(dy, color, rast, btable, residuals, T, instance_mode,
                      interpret=False, viewport=None):
    """Fused AA backward (NHWC boundary)."""
    B, H, W, C = color.shape
    N = B * H * W
    rflat = rast.reshape(N, 4)
    g_color, rid2, gval2 = aa_backward_fused_cols(
        dy.reshape(N, C).T, color.reshape(N, C).T, rflat[:, 3], btable,
        residuals, T, instance_mode, (B, H, W, C), interpret=interpret,
        viewport=viewport)
    return g_color.T.reshape(B, H, W, C), rid2, gval2


def aa_backward_fused_cols(dyt, ct, idf0, btable, residuals, T,
                           instance_mode, shape, interpret=False,
                           viewport=None):
    """Fused AA backward on flat channel-major inputs.

    Returns (g_color [C, N] channel-major, rid2 [2N] int32,
    gval2 [9, 2N]): the position-gradient reduction (MXU one-hot
    scatter) stays outside.
    """
    from .antialias import decode_aux, pair_pos_grad

    (al0, ax0, al1, ax1) = residuals
    B, H, W, C = shape
    N = B * H * W
    BLKR = _blkr(2 * C)

    Hf = viewport[1] if viewport is not None else H
    fx, fy, rofs, bx, by = _grids(B, H, W, T, instance_mode, viewport)

    idfx, idfd = _shifts(idf0, bx, by, W)
    cx, cd = _shifts(ct, bx, by, W)
    dyx, dyd = _shifts(dyt, bx, by, W)

    # Same tile-major regrouping as the forward; the residuals arrive
    # already in the kernel's padded tile order.
    from .texture_pallas import _tile_order, _tile_unorder
    to = lambda a: _tile_order(a, B, H, W)  # noqa: E731
    idf0, idfx, idfd, fx, fy, rofs = (
        to(a) for a in (idf0, idfx, idfd, fx, fy, rofs))
    ct_t, cx, cd, dyt_t, dyx, dyd = (
        to(a) for a in (ct, cx, cd, dyt, dyx, dyd))
    Np = idf0.shape[-1]
    rows_p = _cdiv(_cdiv(Np, LANE), BLKR) * BLKR

    tbl3 = _prep_table(btable)
    HI = tbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in
            (idf0, idfx, idfd, fx, fy, rofs, al0, ax0, al1, ax1)]
    cargs = [_flatpad(a, rows_p) for a in (ct_t, cx, cd, dyt_t, dyx, dyd)]

    def kernel(tbl_ref, i0_ref, ix_ref, iy_ref, fx_ref, fy_ref, ro_ref,
               al0_ref, ax0_ref, al1_ref, ax1_ref,
               c0_ref, cx_ref, cy_ref, dy0_ref, dyx_ref, dyy_ref,
               gc_ref, vx_ref, vy_ref, gv0_ref, gv1_ref, rid0_ref, rid1_ref,
               t9):
        id0 = i0_ref[...]
        fxv = fx_ref[...]
        fyv = fy_ref[...]
        ro = ro_ref[...]
        c0 = [c0_ref[c] for c in range(C)]
        dy0 = [dy0_ref[c] for c in range(C)]
        for c in range(C):
            gc_ref[c] = dy0[c]

        for d, (i1_ref, c1_ref, dy1_ref, v_ref, gv_ref, rid_ref,
                al_ref, ax_ref) in enumerate(
                ((ix_ref, cx_ref, dyx_ref, vx_ref, gv0_ref, rid0_ref,
                  al0_ref, ax0_ref),
                 (iy_ref, cy_ref, dyy_ref, vy_ref, gv1_ref, rid1_ref,
                  al1_ref, ax1_ref))):
            al = al_ref[...]
            zero = jnp.zeros(al.shape, jnp.float32)
            rid_ref[...] = ro
            for c in range(C):
                v_ref[c] = zero
            for k in range(9):
                gv_ref[k] = zero

            # Replay only blocks that recorded silhouette pairs in the
            # forward (tile-ordered pixels cluster them; everything
            # the guard skips has al == 0, i.e. zero contributions).
            @pl.when(jnp.any(al != 0.0))
            def _replay(d=d, i1_ref=i1_ref, c1_ref=c1_ref,
                        dy1_ref=dy1_ref, v_ref=v_ref, gv_ref=gv_ref,
                        rid_ref=rid_ref, ax_ref=ax_ref, al=al):
                di, is_t1 = decode_aux(ax_ref[...])
                active = al != 0.0
                idf = jnp.where(is_t1, i1_ref[...], id0)
                tsel = idf.astype(jnp.int32) - 1
                ok = active & (tsel >= 0) & (tsel < T)
                tid = jnp.where(ok, tsel, 0)
                rid = jnp.where(ok, tid + ro, ro)
                rid_ref[...] = rid

                _masked_gather(tbl_ref, rid, ok,
                               9, [_Sub(t9, k) for k in range(9)])
                t9v = [t9[k] for k in range(9)]

                apos = al > 0
                dd = jnp.zeros_like(al)
                for c in range(C):
                    pdy = jnp.where(apos, dy0[c], dy1_ref[c])
                    v = al * pdy
                    gc_ref[c] = gc_ref[c] - v
                    v_ref[c] = v
                    dd = dd + pdy * (c1_ref[c] - c0[c])
                dd = jnp.where(active, dd, 0.0)
                keep = ok & (dd != 0.0) & (jnp.abs(al) < 0.5)
                cols = pair_pos_grad(t9v, dd, keep, di, is_t1, fxv, fyv,
                                     d, W, Hf)
                for k in range(9):
                    gv_ref[k] = cols[k]

    grid = (rows_p // BLKR,)
    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((C, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    g9_spec = pl.BlockSpec((9, BLKR, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((9, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    iflat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((9, rows_p, LANE), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((rows_p, LANE), jnp.int32)] * 2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tbl_spec] + [flat_spec] * 10 + [chan_spec] * 6,
        out_specs=[chan_spec] * 3 + [g9_spec] * 2 + [iflat_spec] * 2,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((9, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(tbl3, *args, *cargs)

    gc, vx, vy, gv0, gv1, rid0, rid1 = outs

    def unflat(a):
        # kernel layout -> row-major [.., N]. Stripping the tile
        # padding here is load-bearing for rid/gval: padded lanes
        # replicate edge pixels and would double-count their position
        # gradients in the scatter.
        flat = a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :Np]
        return _tile_unorder(flat, B, H, W)

    g_color = unflat(gc)  # [C, N]
    g_color = g_color + _roll_next_last(unflat(vx), 1)
    g_color = g_color + _roll_next_last(unflat(vy), W)

    rid2 = jnp.concatenate([unflat(rid0), unflat(rid1)])
    gval2 = jnp.concatenate([unflat(gv0), unflat(gv1)], axis=1)
    return g_color, rid2, gval2
