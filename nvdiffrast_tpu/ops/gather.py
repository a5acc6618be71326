"""Fast per-pixel table lookups (the pipeline's universal primitive).

Every op's per-pixel stage starts by fetching a per-triangle record by
the pixel's triangle id (the reference does this as raw per-thread
loads, e.g. csrc/common/interpolate.cu:30-36). XLA's gather lowering
costs ~9 ns/lookup on TPU regardless of table size; this Pallas kernel
does the same lookup with the table resident in VMEM, decomposing the
id into (chunk, lane) and using the VPU's lane-wise dynamic gather per
128-entry chunk with select-accumulate across chunks. Spatially
coherent ids (the common case — triangle ids are tile-local after the
rasterizer) cut the chunk sweep to the per-block id range, giving
~3-10x over the XLA gather at benchmark scale.

Falls back to ``jnp.take`` off-TPU, under interpret mode, for small
pixel counts, and for tables too large to hold in VMEM.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BLKR = 512            # pixel rows per grid step (x128 px)
_MIN_N = _LANE * _BLKR  # below this, XLA's gather overhead is fine
_MAX_VMEM_TABLE = 1 << 21  # table floats kept in VMEM (8 MB f32)


def _cdiv(a, b):
    return -(-a // b)


def _take_pallas(tbl_t, rid, interpret=False):
    K, T = tbl_t.shape
    N = rid.shape[0]

    Tp = _cdiv(T, _LANE) * _LANE
    HI = Tp // _LANE
    if Tp != T:
        tbl_t = jnp.pad(tbl_t, ((0, 0), (0, Tp - T)))
    tbl3 = tbl_t.reshape(K, HI, _LANE)

    rows = _cdiv(N, _LANE)
    rows_p = _cdiv(rows, _BLKR) * _BLKR
    Np = rows_p * _LANE
    if Np != N:
        rid = jnp.pad(rid, (0, Np - N))
    idx2 = rid.reshape(rows_p, _LANE)

    def kernel(idx_ref, tbl_ref, out_ref):
        idx = idx_ref[:]
        hi = idx >> 7
        lo = idx & 127
        # Coherent ids make the per-block chunk range tiny.
        h_lo = jnp.min(hi)
        h_hi = jnp.max(hi)

        def hbody(h, _):
            mask = hi == h
            for k in range(K):
                row = tbl_ref[k, h, :]
                chunk = jnp.broadcast_to(row[None, :], (_BLKR, _LANE))
                g = jnp.take_along_axis(chunk, lo, axis=1)
                out_ref[k] = jnp.where(mask, g, out_ref[k])
            return _

        for k in range(K):
            out_ref[k] = jnp.zeros((_BLKR, _LANE), jnp.float32)
        jax.lax.fori_loop(h_lo, h_hi + 1, hbody, 0)

    out = pl.pallas_call(
        kernel,
        grid=(rows_p // _BLKR,),
        in_specs=[
            pl.BlockSpec((_BLKR, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, HI, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, _BLKR, _LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, rows_p, _LANE), jnp.float32),
        interpret=interpret,
    )(idx2, tbl3)
    return out.reshape(K, Np)[:, :N]


def table_take(tbl_t, rid, impl="auto"):
    """out[k, i] = tbl_t[k, rid[i]] — channel-major table lookup.

    Args:
      tbl_t: [K, T] float32 table (channel-major). Out-of-range ids
        must point at zero entries the caller appended.
      rid: [N] int32 ids in [0, T).
      impl: 'auto' | 'xla' | 'pallas' | 'pallas_interpret'.

    Returns:
      [K, N] float32.
    """
    K, T = tbl_t.shape
    N = rid.shape[0]
    use_pallas = (
        impl in ("pallas", "pallas_interpret")
        or (impl == "auto" and jax.default_backend() == "tpu"))
    use_pallas &= N >= _MIN_N and K * _cdiv(T, _LANE) * _LANE <= _MAX_VMEM_TABLE
    if not use_pallas:
        return jnp.take(tbl_t, rid, axis=1)
    return _take_pallas(tbl_t, rid, interpret=(impl == "pallas_interpret"))


@jax.custom_vjp
def table_take_vjp(tbl_t, rid):
    """Differentiable table_take: gradients flow to the table.

    The VJP of a gather is a scatter-add by the same ids — exactly
    `scatter_add_by_id`, so both directions run on the fast kernels.
    """
    return table_take(tbl_t, rid)


def _tt_fwd(tbl_t, rid):
    return table_take(tbl_t, rid), (rid, tbl_t.shape[1])


def _tt_bwd(res, ct):
    rid, T = res
    from .scatter import scatter_add_by_id

    g_tbl = scatter_add_by_id(rid, ct, T).T  # [K, T]
    return (g_tbl, None)


table_take_vjp.defvjp(_tt_fwd, _tt_bwd)
