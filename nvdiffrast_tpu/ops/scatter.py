"""Deterministic high-throughput scatter-add for pixel->table gradients.

The reference accumulates per-pixel gradients into per-vertex/texel
buffers with coalesced float atomics (csrc/common/common.h:198-260) —
fast on GPU but nondeterministic. The TPU-native equivalent maps the
reduction onto the MXU: a chunked one-hot matmul accumulates in
float32 with exact 0/1 weights, is bit-deterministic, and beats XLA's
scatter lowering ~2x at the benchmark scale. Tables past the VMEM
accumulator budget run row-blocked (grid over output blocks with a
chunk remap); only incoherent-id + huge-table combinations fall back
to XLA scatter-add (also deterministic on TPU, just slower).

Layout rule: per-pixel values travel CHANNEL-MAJOR ([K, N], pixel axis
minormost). A [N, K] array with K < 128 is lane-padded to 128 in both
VMEM and HBM on TPU — a 4M-pixel [N, 9] buffer would silently cost
2 GB. [K, N] only pads K up to the sublane multiple (8).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The XLA one-hot matmul is O(N * R); past this table size the scatter
# lowering wins despite its overhead.
_ONEHOT_MAX_ROWS = 16384
# The Pallas kernel sweeps only the per-chunk id window, so its compute
# is O(N * window) and the VMEM accumulator (the resident output block)
# holds at most this many floats (10.5 MB budget). Tables past the
# budget are split into row blocks: grid (block, chunk) with a
# scalar-prefetch remap so each block's sweep visits only the chunks
# whose id window overlaps it (spatially coherent gradient streams
# touch ~1 block per chunk).
_PALLAS_MAX_ACC = 5 << 19
# Output-block VMEM budget in BYTES, accounting for what the compiler
# actually allocates: the FK value-row axis is sublane-padded to a
# multiple of 8 (K=9 -> 16 rows, 1.78x), and with NB > 1 the output
# block is PIPELINE-DOUBLE-BUFFERED (two copies on the scoped-vmem
# stack; with NB == 1 the constant index map keeps one). The old
# float-count budget ignored both and overflowed the ~16 MB VMEM at
# texture-gradient scale (2 x 48 x 54528 x 4 B = 20.9 MB -> the
# round-3 "bigtex bwd" Mosaic failure) and at big-mesh rasterize-bwd
# scale (2 x 16 x 174720 x 4 B = 22.4 MB, bigmesh fwd+bwd at 261k
# tris — exact error text in benchmarks/results_r4.md). 10 MB leaves
# ~5 MB for the double-buffered id/value input blocks and the
# one-hot / hi-lo temporaries.
_PALLAS_OUT_BYTES = 10 << 20


# SMEM budget for the per-(block, chunk) remap table of the row-blocked
# path (int32 entries). 2^17 entries = 512 KB of scalar memory: the
# earth-atlas texture gradient (NTe ~4.2M rows -> NB ~20 blocks x ~2k
# chunks) needs ~40k entries and previously fell back to the XLA
# scatter lowering (~2.6 s fwd+bwd, benchmarks/results_r4.md) because
# the 2^15 cap rejected it.
_SCAT_REMAP_MAX = 1 << 17
_CHUNK = 1 << 15
_P_CHUNK = 8192  # pixels per grid step (amortizes per-step DMA/grid
                 # cost; 16384 overflows scoped VMEM via the F-expanded
                 # value block)
# One-hot window width per sweep step. The window build costs
# _QW * _P_CHUNK vector compares per live window — the dominant cost
# of the whole scatter — so the window is kept as narrow as the id
# coherence allows: rasterized gradient streams are spatially sorted,
# so a 4096-pixel chunk touches ~1 narrow window.
_QW = 128


def _cdiv(a, b):
    return -(-a // b)


def _qrb_for(FK, QR):
    """Output rows per block: largest _QW multiple whose resident
    copies fit _PALLAS_OUT_BYTES (1 copy when the whole table fits a
    single block, else 2 pipeline copies), on the sublane-padded FK."""
    FKp = _cdiv(FK, 8) * 8
    qrb1 = max(_PALLAS_OUT_BYTES // (4 * FKp) // _QW, 1) * _QW
    if QR <= qrb1:
        return qrb1
    return max(_PALLAS_OUT_BYTES // (8 * FKp) // _QW, 1) * _QW


def _scatter_pallas(ids, vals_t, num_rows, F, interpret=False,
                    p_chunk=_P_CHUNK):
    """One-hot reduction with the one-hot tile built in VMEM.

    The XLA one-hot path materializes the [N, R/F] one-hot matrix in
    HBM (~N*R/F*4 bytes of traffic — gigabytes at 4M pixels); here each
    grid step builds its one-hot tile in registers, feeds the MXU
    directly, and accumulates the [F*K, QR] table in the VMEM-resident
    output block. Values are split hi/lo into bfloat16 factors
    (one-hot entries are exact in bf16), keeping ~2^-16 relative
    accuracy with f32 accumulation while running the MXU at bf16 rate;
    when 2*F*K <= 128 both factors ride ONE matmul (stacked output
    rows — same contraction sweep, half the MXU passes).

    Large tables: each chunk sweeps only the _QW-lane windows its ids
    actually touch (ids from rasterized pixels are spatially coherent,
    so this is 1-2 windows per chunk), making compute O(N * window)
    instead of O(N * R) — the equivalent of the reference's per-warp
    triangle grouping in caAtomicAdd (common.h:198-260).
    """
    K, N = vals_t.shape
    Rf = _cdiv(num_rows, F) * F
    QR = max(_cdiv(Rf // F, _QW) * _QW, _QW)  # window-pad the row axis
    FK = F * K
    _P_CHUNK = p_chunk

    n_chunks = _cdiv(N, _P_CHUNK)
    Np = n_chunks * _P_CHUNK
    if Np != N:
        ids = jnp.pad(ids, (0, Np - N), constant_values=-1)
        vals_t = jnp.pad(vals_t, ((0, 0), (0, Np - N)))
    # Out-of-range ids -> sentinel past the padded table; the window
    # sweep masks them out of the min/max range entirely.
    ids = jnp.where((ids >= 0) & (ids < num_rows), ids, Rf + F)

    # Row blocks sized to the real VMEM footprint (see _qrb_for).
    QRB = min(QR, _qrb_for(FK, QR))
    NB = _cdiv(QR, QRB)
    n_win = QRB // _QW

    remap = counts = None
    if NB > 1:
        # Per-chunk folded-row window from live lanes (zero-value lanes
        # carry placeholder ids and must not widen the window), then a
        # per-block hit list so block b's sweep only visits overlapping
        # chunks (same scalar-prefetch remap trick as the rasterizer).
        big = jnp.int32(1 << 30)
        qv = ids // F
        live = jnp.any(vals_t != 0.0, axis=0) & (qv < QR)
        qc = jnp.where(live, qv, big).reshape(n_chunks, _P_CHUNK)
        qmin = qc.min(axis=-1)
        qmax = jnp.where(live, qv, -1).reshape(n_chunks, _P_CHUNK).max(-1)
        b_lo = jnp.arange(NB, dtype=jnp.int32)[:, None] * QRB
        hit = (qmin[None, :] <= b_lo + (QRB - 1)) & (qmax[None, :] >= b_lo)
        counts = jnp.sum(hit, axis=-1, dtype=jnp.int32)  # [NB]
        remap = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32)

    # Stack the hi/lo bf16 factors along the value-row axis when the
    # stacked block still fits one MXU output tile: one matmul with
    # 2*FK output rows costs the same contraction sweep as one, halving
    # the MXU work vs two sequential matmuls.
    stack_hilo = 2 * FK <= 128

    def body(ids_ref, vals_ref, out_ref, q0):
        idc = ids_ref[0]  # [P_CHUNK] (pixels on lanes)
        q = idc // F - q0  # block-local folded row
        s = idc - (idc // F) * F
        vc = vals_ref[0]  # [K, P_CHUNK]

        # Gradient streams are often sparse (antialias touches only
        # silhouette pairs; rasterize only covered pixels) — an
        # all-zero chunk contributes nothing, skip it entirely.
        chunk_live = jnp.any(vc != 0.0)
        # All-zero LANES are excluded from the window range: inactive
        # pixels carry a placeholder id (row 0), which would otherwise
        # drag every chunk's sweep down to window 0 and force a
        # one-hot + matmul for pure-zero columns. Rows of other blocks
        # are masked the same way.
        lane_live = jnp.any(vc != 0.0, axis=0) & (q >= 0) & (q < QRB)
        q = jnp.where(lane_live, q, QRB + 1)

        # vals_exp[f*K + k, p] = vals[k, p] * (s_p == f)
        if F == 1:
            ve = vc
        else:
            rows = []
            for f in range(F):
                m = (s == f)[None, :]
                rows.append(jnp.where(m, vc, 0.0))
            ve = jnp.concatenate(rows, axis=0)  # [FK, P_CHUNK]
        ve_hi = ve.astype(jnp.bfloat16)
        ve_lo = (ve - ve_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if stack_hilo:
            ve_hi = jnp.concatenate([ve_hi, ve_lo], axis=0)  # [2FK, P]

        dn = (((1,), (1,)), ((), ()))
        valid = q < QRB
        big = jnp.int32(1 << 30)
        w_lo = jnp.min(jnp.where(valid, q, big)) // _QW
        w_hi = jnp.max(jnp.where(valid, q, -1)) // _QW

        qw = q // _QW

        def wbody(w, carry):
            # Multimodal id streams (e.g. mip-level-mixed texel ids)
            # make [w_lo, w_hi] span nearly the whole table while only
            # a few windows are actually hit — test before paying for
            # the one-hot build + matmuls. chunk_live additionally
            # skips fully-zero chunks.
            @pl.when(chunk_live & jnp.any(qw == w))
            def _do():
                # One-hot for window w, pixels kept on lanes:
                # ohT[r, p] = (q_p == w*_QW + r).
                rr = jax.lax.broadcasted_iota(jnp.int32, (_QW, _P_CHUNK), 0)
                oht = (rr == (q - w * _QW)[None, :]).astype(jnp.bfloat16)
                if stack_hilo:
                    both = jax.lax.dot_general(
                        ve_hi, oht, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    upd = both[:FK] + both[FK:]
                else:
                    upd = jax.lax.dot_general(
                        ve_hi, oht, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    upd += jax.lax.dot_general(
                        ve_lo, oht, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                dsw = pl.ds(pl.multiple_of(w * _QW, _QW), _QW)
                out_ref[:, dsw] += upd
            return carry

        if n_win == 1:
            wbody(0, 0)
        else:
            jax.lax.fori_loop(w_lo, w_hi + 1, wbody, 0)

    ids2 = ids.reshape(1, Np)
    vals3 = vals_t.reshape(1, K, Np)

    if NB == 1:
        def kernel(ids_ref, vals_ref, out_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[...] = jnp.zeros((FK, QRB), jnp.float32)

            body(ids_ref, vals_ref, out_ref, 0)

        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, _P_CHUNK), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, _P_CHUNK), lambda c: (0, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((FK, QRB), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FK, QRB), jnp.float32),
            interpret=interpret,
        )(ids2, vals3)
    else:
        def chunk_of(b, c, remap_ref, cnt_ref):
            cc = jnp.minimum(c, jnp.maximum(cnt_ref[b] - 1, 0))
            return remap_ref[b, cc]

        def kernel(remap_ref, cnt_ref, ids_ref, vals_ref, out_ref):
            b = pl.program_id(0)
            c = pl.program_id(1)

            @pl.when(c == 0)
            def _():
                out_ref[...] = jnp.zeros((FK, QRB), jnp.float32)

            @pl.when(c < cnt_ref[b])
            def _():
                body(ids_ref, vals_ref, out_ref, b * QRB)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NB, n_chunks),
            in_specs=[
                pl.BlockSpec((1, _P_CHUNK),
                             lambda b, c, r_, n_: (0, chunk_of(b, c, r_, n_)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, _P_CHUNK),
                             lambda b, c, r_, n_: (0, 0,
                                                   chunk_of(b, c, r_, n_)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((FK, QRB), lambda b, c, r_, n_: (0, b),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((FK, NB * QRB), jnp.float32),
            interpret=interpret,
        )(remap, counts, ids2, vals3)

    # out[f*K + k, q] -> result[q*F + f, k].
    out = out[:, :Rf // F]  # [FK, R/F]
    out = out.reshape(F, K, Rf // F)
    out = jnp.transpose(out, (2, 0, 1)).reshape(Rf, K)
    return out[:num_rows]


def scatter_add_by_id(ids, vals_t, num_rows, method="auto",
                      coherent=False, p_chunk=None):
    """out[r, k] = sum over i with ids[i] == r of vals_t[k, i].

    Args:
      ids: [N] int32 row ids; out-of-range ids are dropped.
      vals_t: [K, N] float32, channel-major.
      num_rows: R, static.
      method: 'auto' | 'onehot' | 'pallas' | 'pallas_interpret' |
        'scatter'.
      coherent: caller's promise that ids are spatially sorted-ish
        (nearby stream positions hit nearby rows — true for every
        rasterized-pixel gradient stream). Required for 'auto' to pick
        the row-blocked Pallas path on tables past the single-block
        accumulator budget: with random ids every chunk's id window
        spans every row block and the window sweep degenerates.
      p_chunk: pixels per Pallas grid step (default _P_CHUNK). The
        window sweep's one-hot/matmul overdraw scales with the id SPAN
        of a chunk, so streams whose span grows with chunk size (e.g.
        texel ids of an image tile) win from smaller chunks; streams
        with tiny spans (triangle ids) amortize better with large ones.

    Returns:
      [R, K] float32.
    """
    K, N = vals_t.shape
    if p_chunk is None:
        p_chunk = _P_CHUNK

    # The kernel is VPU-bound (one-hot build + F-expanded value
    # block), not MXU-bound, so row folding only pays when K is
    # tiny; wide value blocks run unfolded.
    F = 1
    while K < 8 and (F * 2 * K <= 128) and (F < 8):
        F *= 2

    def pallas_ok():
        if num_rows * K <= _PALLAS_MAX_ACC:
            return True  # single-block: window sweep bounds the cost
        if not coherent:
            return False
        FK = F * K
        QR = max(_cdiv(_cdiv(num_rows, F), _QW) * _QW, _QW)
        QRB = min(QR, _qrb_for(FK, QR))
        NB = _cdiv(QR, QRB)
        return NB * _cdiv(N, p_chunk) <= _SCAT_REMAP_MAX

    if method == "auto":
        if (jax.default_backend() == "tpu"
                and N >= 4 * _CHUNK
                and pallas_ok()):
            method = "pallas"
        elif num_rows <= _ONEHOT_MAX_ROWS and N >= 4 * _CHUNK:
            method = "onehot"
        else:
            method = "scatter"

    if method in ("pallas", "pallas_interpret"):
        return _scatter_pallas(ids, vals_t, num_rows, F,
                               interpret=(method == "pallas_interpret"),
                               p_chunk=p_chunk)

    if method == "scatter":
        safe = jnp.where((ids >= 0) & (ids < num_rows), ids, num_rows)
        return jnp.zeros((num_rows, K), jnp.float32).at[safe].add(
            vals_t.T, mode="drop")

    # Chunked one-hot matmul on the MXU (f32 accumulate, deterministic).
    # Row folding: with raw K lanes the MXU runs at K/128 utilization, so
    # F=8 consecutive table rows are packed into the lane dimension
    # (out[q, f*K+k] for row q*F+f) — 8x fewer one-hot columns and ~56%
    # lane utilization, at the cost of F-expanded value traffic.
    F = 1
    while (F * 2 * K <= 128) and (F < 8):
        F *= 2
    Rf = -(-num_rows // F) * F
    QR = Rf // F

    n_chunks = -(-N // _CHUNK)
    Np = n_chunks * _CHUNK
    if Np != N:
        ids = jnp.pad(ids, (0, Np - N), constant_values=-1)
        vals_t = jnp.pad(vals_t, ((0, 0), (0, Np - N)))
    # Out-of-range ids -> an id whose q is out of range (dropped).
    ids = jnp.where((ids >= 0) & (ids < num_rows), ids, Rf)
    row_ids = jnp.arange(QR, dtype=ids.dtype)

    def body(i, acc):
        idc = jax.lax.dynamic_slice(ids, (i * _CHUNK,), (_CHUNK,))
        vc = jax.lax.dynamic_slice(vals_t, (0, i * _CHUNK), (K, _CHUNK))
        q = idc // F
        s = idc % F
        oh = (q[:, None] == row_ids[None, :]).astype(jnp.float32)
        if F > 1:
            vc = jnp.concatenate(
                [jnp.where(s[None, :] == f, vc, 0.0) for f in range(F)],
                axis=0)  # [F*K, CHUNK]
        # out[qr, fk] = sum_p oh[p, qr] * vc[fk, p]
        return acc + jax.lax.dot_general(
            oh, vc, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((QR, F * K), jnp.float32)
    out = jax.lax.fori_loop(0, n_chunks, body, acc0)
    return out.reshape(Rf, K)[:num_rows]
