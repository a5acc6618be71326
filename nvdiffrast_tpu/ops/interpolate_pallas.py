"""Fused Pallas TPU kernels for the interpolate op.

One kernel per direction replaces the separate table_take + ~10
elementwise XLA passes of interpolate.py: the per-triangle attribute
table lives in VMEM, the per-pixel row gather (table_take's chunk/lane
sweep over the block's id range) and the barycentric combine run in one
pass, and nothing intermediate ([3A, N] gathered rows) ever touches
HBM. The backward kernel re-gathers and emits the bary gradients, the
per-pixel attribute-gradient columns for the MXU scatter, and the
rast_db gradients.

Math is identical to interpolate.py's XLA path (shared structure, same
formulas — re-derivations of csrc/common/interpolate.cu:15-274).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BLKR = 256
_MAX_VMEM_TABLE = 1 << 21  # table floats kept in VMEM (8 MB f32)
_MAX_K = 48  # 3A cap: A <= 16 attributes on the fused path
_MIN_N = 1 << 16


def _cdiv(a, b):
    return -(-a // b)


def supported(A, n_rows, N, force=False):
    K = 3 * A
    return (K <= _MAX_K and (force or N >= _MIN_N)
            and K * _cdiv(n_rows + 1, LANE) * LANE <= _MAX_VMEM_TABLE)


def _flatpad(x, rows_p, fill=None):
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
    K, R = tbl.shape
    Rp = _cdiv(R, LANE) * LANE
    if Rp != R:
        tbl = jnp.pad(tbl, ((0, 0), (0, Rp - R)))
    return tbl.reshape(K, Rp // LANE, LANE)


def _gather_rows(tbl_ref, rid, active, nk, g_ref):
    """g_ref[k] <- tbl[k, rid] for active pixels (others zero)."""
    shape = rid.shape
    hi = rid >> 7
    lo = rid & 127
    big = jnp.int32(1 << 30)
    h_lo = jnp.min(jnp.where(active, hi, big))
    h_hi = jnp.max(jnp.where(active, hi, -1))

    for k in range(nk):
        g_ref[k] = jnp.zeros(shape, jnp.float32)

    def hbody(h, carry):
        mask = (hi == h) & active
        for k in range(nk):
            row = tbl_ref[k, h, :]
            chunk = jnp.broadcast_to(row[None, :], shape)
            g = jnp.take_along_axis(chunk, lo, axis=1)
            g_ref[k] = jnp.where(mask, g, g_ref[k])
        return carry

    jax.lax.fori_loop(h_lo, h_hi + 1, hbody, 0)


def interp_forward_fused(tbl, rid, b0, b1, b2, valid, db_cols, A, diff_list,
                         interpret=False):
    """Fused forward. Flat [N] inputs; returns (out [A, N], da [2D, N])."""
    N = rid.shape[0]
    K = 3 * A
    D = len(diff_list)
    rows_p = _cdiv(_cdiv(N, LANE), _BLKR) * _BLKR

    tbl3 = _prep_table(tbl)
    HI = tbl3.shape[1]

    args = [_flatpad(rid, rows_p, fill=tbl.shape[1] - 1),
            _flatpad(valid.astype(jnp.int32), rows_p, fill=0)]
    args += [_flatpad(a, rows_p) for a in (b0, b1, b2)]
    if D:
        args += [_flatpad(a, rows_p) for a in db_cols]

    def kernel(*refs):
        if D:
            (tbl_ref, rid_ref, val_ref, b0_ref, b1_ref, b2_ref,
             dux_ref, duy_ref, dvx_ref, dvy_ref, out_ref, da_ref,
             g_ref) = refs
        else:
            (tbl_ref, rid_ref, val_ref, b0_ref, b1_ref, b2_ref,
             out_ref, g_ref) = refs
        rid_v = rid_ref[...]
        act = val_ref[...] != 0
        _gather_rows(tbl_ref, rid_v, act, K, g_ref)
        bb0 = b0_ref[...]
        bb1 = b1_ref[...]
        bb2 = b2_ref[...]
        for a in range(A):
            out_ref[a] = (bb0 * g_ref[a] + bb1 * g_ref[A + a]
                          + bb2 * g_ref[2 * A + a])
        if D:
            dux = dux_ref[...]
            duy = duy_ref[...]
            dvx = dvx_ref[...]
            dvy = dvy_ref[...]
            for jj, j in enumerate(diff_list):
                dsdu = g_ref[j] - g_ref[2 * A + j]
                dsdv = g_ref[A + j] - g_ref[2 * A + j]
                da_ref[2 * jj] = dux * dsdu + dvx * dsdv
                da_ref[2 * jj + 1] = duy * dsdu + dvy * dsdv

    flat_spec = pl.BlockSpec((_BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((K, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def chan(n):
        return pl.BlockSpec((n, _BLKR, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tbl_spec] + [flat_spec] * (5 + (4 if D else 0))
    out_specs = [chan(A)] + ([chan(2 * D)] if D else [])
    out_shape = [jax.ShapeDtypeStruct((A, rows_p, LANE), jnp.float32)]
    if D:
        out_shape.append(
            jax.ShapeDtypeStruct((2 * D, rows_p, LANE), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // _BLKR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, _BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(tbl3, *args)

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    out = unflat(outs[0])
    da = unflat(outs[1]) if D else jnp.zeros((0, N), jnp.float32)
    return out, da


def interp_backward_fused(tbl, rid, b0, b1, b2, valid, db_cols, gy_cols,
                          gda_cols, A, diff_list, interpret=False):
    """Fused backward. Returns (grast01 [2, N], gval [3A, N],
    gdb [4, N] or None)."""
    N = rid.shape[0]
    K = 3 * A
    D = len(diff_list)
    rows_p = _cdiv(_cdiv(N, LANE), _BLKR) * _BLKR

    tbl3 = _prep_table(tbl)
    HI = tbl3.shape[1]

    args = [_flatpad(rid, rows_p, fill=tbl.shape[1] - 1),
            _flatpad(valid.astype(jnp.int32), rows_p, fill=0)]
    args += [_flatpad(a, rows_p) for a in (b0, b1, b2)]
    args += [_flatpad(a, rows_p, fill=0.0) for a in gy_cols]
    if D:
        args += [_flatpad(a, rows_p) for a in db_cols]
        args += [_flatpad(a, rows_p, fill=0.0) for a in gda_cols]

    def kernel(*refs):
        i = 0
        tbl_ref = refs[i]; i += 1
        rid_ref = refs[i]; i += 1
        val_ref = refs[i]; i += 1
        b_refs = refs[i:i + 3]; i += 3
        gy_refs = refs[i:i + A]; i += A
        if D:
            db_refs = refs[i:i + 4]; i += 4
            gda_refs = refs[i:i + 2 * D]; i += 2 * D
        grast_ref, gval_ref = refs[i], refs[i + 1]; i += 2
        if D:
            gdb_ref = refs[i]; i += 1
        g_ref = refs[i]

        rid_v = rid_ref[...]
        act = val_ref[...] != 0
        _gather_rows(tbl_ref, rid_v, act, K, g_ref)
        bb0 = b_refs[0][...]
        bb1 = b_refs[1][...]
        bb2 = b_refs[2][...]
        gy = [gy_refs[a][...] for a in range(A)]

        zero = jnp.zeros_like(bb0)
        gb0 = zero
        gb1 = zero
        for a in range(A):
            gb0 = gb0 + gy[a] * (g_ref[a] - g_ref[2 * A + a])
            gb1 = gb1 + gy[a] * (g_ref[A + a] - g_ref[2 * A + a])
        grast_ref[0] = gb0
        grast_ref[1] = gb1

        ga = [None] * K
        for a in range(A):
            ga[a] = bb0 * gy[a]
            ga[A + a] = bb1 * gy[a]
            ga[2 * A + a] = bb2 * gy[a]

        if D:
            dux = db_refs[0][...]
            duy = db_refs[1][...]
            dvx = db_refs[2][...]
            dvy = db_refs[3][...]
            gdb = [zero, zero, zero, zero]
            for jj, j in enumerate(diff_list):
                gdax = gda_refs[2 * jj][...]
                gday = gda_refs[2 * jj + 1][...]
                c0 = dux * gdax + duy * gday
                c1 = dvx * gdax + dvy * gday
                ga[j] = ga[j] + c0
                ga[A + j] = ga[A + j] + c1
                ga[2 * A + j] = ga[2 * A + j] - c0 - c1
                dsdu = g_ref[j] - g_ref[2 * A + j]
                dsdv = g_ref[A + j] - g_ref[2 * A + j]
                gdb[0] = gdb[0] + gdax * dsdu
                gdb[1] = gdb[1] + gday * dsdu
                gdb[2] = gdb[2] + gdax * dsdv
                gdb[3] = gdb[3] + gday * dsdv
            for c in range(4):
                gdb_ref[c] = jnp.where(act, gdb[c], 0.0)

        for k in range(K):
            gval_ref[k] = jnp.where(act, ga[k], 0.0)

    flat_spec = pl.BlockSpec((_BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((K, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def chan(n):
        return pl.BlockSpec((n, _BLKR, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    n_in = 5 + A + ((4 + 2 * D) if D else 0)
    in_specs = [tbl_spec] + [flat_spec] * n_in
    out_specs = [chan(2), chan(K)] + ([chan(4)] if D else [])
    out_shape = [jax.ShapeDtypeStruct((2, rows_p, LANE), jnp.float32),
                 jax.ShapeDtypeStruct((K, rows_p, LANE), jnp.float32)]
    if D:
        out_shape.append(jax.ShapeDtypeStruct((4, rows_p, LANE), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // _BLKR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, _BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(tbl3, *args)

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    grast01 = unflat(outs[0])
    gval = unflat(outs[1])
    gdb = unflat(outs[2]) if D else None
    return grast01, gval, gdb
