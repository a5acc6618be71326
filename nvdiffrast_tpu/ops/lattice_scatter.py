"""Separable lattice scatter for texture gradients (TPU extension).

The texture backward's wrt-tex reduction scatters 4 corner taps x 2 mip
slots per pixel into the apron pyramid. The generic windowed one-hot
scatter (ops/scatter.py) pays one [128, P] one-hot build + hi/lo
matmuls per live id window over 4 duplicated pixel streams — measured
as the dominant texture-backward cost (~24 ms at 2048^2/512^2,
~164 ms on the 1536x2048 earth atlas).

TPU-native replacement: the bilinear 2x2 stamp is SEPARABLE — corner
weight (du, dv) = uw_du * vw_dv — so a pixel chunk's contribution to
one (8, 128) texel tile of the tiled apron pyramid (texture_pallas.
ext_meta_tiled layout) is a single rank-revealing matmul per channel:

    G_c[r, c] = sum_p (A[r, p] * dy_c[p]) * B[c, p]
    A[r, p] = sum_dv vw_dv,p * [apron_row(p) + dv - r0 == r]   (8 rows)
    B[c, p] = sum_du uw_du,p * [apron_col(p) + du - c0 == c]   (128 cols)

Both factors are tiny iota-compares; the MXU does the reduction in
f32. One f32 matmul replaces 4 id streams x per-window one-hot builds,
and the accuracy is BETTER than the hi/lo bf16 split (~2^-21 vs
2^-16 per addend). Fully deterministic: pairs are sorted by tile and
accumulate in a fixed order.

Work assignment is a CSR pair list (tile, chunk) built XLA-side from
per-(chunk, level) tile bounding boxes (a superset: extra tiles just
contribute zeros — nothing can be dropped), sorted by tile so each
output tile block stays VMEM-resident across its pairs. Untouched
tiles keep the zero-initialized donated output buffer
(input_output_aliases), so sparse level-0 hits on huge atlases cost
nothing. Pair-list overflow (pathological uv derivative fields) falls
back to the generic scatter via lax.cond.

Reference analog: TextureGradKernel's per-corner caAtomicAdd
(csrc/common/texture_kernel.cu:905-1154) — same math, atomics-free.
"""

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _cdiv(a, b):
    return -(-a // b)


# Pixels per pair chunk. Tile-major pixels form compact image patches
# (P=2048 -> 16x128 px, P=4096 -> 32x128). On-chip A/B
# (benchmarks/results_r5.md): minified sampling (few texel tiles) wins
# at 4096 (512^2 f+b 36.4 -> 33.9 ms — fewer per-pair fixed costs);
# magnified sampling (earth atlas, tile count >> chunk count) wins at
# 2048 (166.8 vs 172.9 — bigger chunks span more tiles each).
# _pick_p chooses statically from the tile/chunk ratio; env overrides.
_P_PAIR = int(os.environ.get("NVDR_SEP_P", "0"))


def _pick_p(n_tiles, total_px):
    if _P_PAIR:
        return _P_PAIR
    return 2048 if n_tiles * 4096 > total_px else 4096


# Pair-list capacity: 6 tiles per chunk covers minified sampling
# (16x128 px patches straddle <= 2x2 texel tiles per live level), and
# the n_tiles term covers magnification (earth-atlas level-0 chunks
# span 3x2+ tiles, but then the total is bounded by how many tiles the
# image can touch, ~2-4 hits per tile). Overflow -> generic fallback.
_PAIR_FACTOR = 6
_PAIR_TILE_FACTOR = 8


def lattice_setup_sep(u, v, hi, wi, boundary_mode):
    """Separable form of texture_pallas.lattice_setup.

    Same per-corner weights (w4[2dv+du] == vw[dv]*uw[du] exactly — the
    factors are the same f32 values lattice_setup multiplies), plus the
    apron coordinates of the (0, 0) tap. Returns
    (jun, jvn, uw0, uw1, vw0, vw1) with jun/jvn in [0, wi]/[0, hi].
    """
    w = wi.astype(jnp.float32) if hasattr(wi, "dtype") else float(wi)
    h = hi.astype(jnp.float32) if hasattr(hi, "dtype") else float(hi)
    if boundary_mode == "wrap":
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
    u = u * w - 0.5
    v = v * h - 0.5
    if boundary_mode == "clamp":
        u = jnp.clip(u, 0.0, w - 1.0)
        v = jnp.clip(v, 0.0, h - 1.0)
    ju = jnp.floor(u).astype(jnp.int32)
    jv = jnp.floor(v).astype(jnp.int32)
    fu = u - ju.astype(jnp.float32)
    fv = v - jv.astype(jnp.float32)
    one = jnp.ones(u.shape, jnp.float32)
    if boundary_mode == "zero":
        u0_ok = ((ju >= 0) & (ju < wi)).astype(jnp.float32)
        u1_ok = ((ju + 1 >= 0) & (ju + 1 < wi)).astype(jnp.float32)
        v0_ok = ((jv >= 0) & (jv < hi)).astype(jnp.float32)
        v1_ok = ((jv + 1 >= 0) & (jv + 1 < hi)).astype(jnp.float32)
        ju = jnp.clip(ju, -1, wi - 1)
        jv = jnp.clip(jv, -1, hi - 1)
    else:
        u0_ok = u1_ok = v0_ok = v1_ok = one
    uw0 = (1.0 - fu) * u0_ok
    uw1 = fu * u1_ok
    vw0 = (1.0 - fv) * v0_ok
    vw1 = fv * v1_ok
    return ju + 1, jv + 1, uw0, uw1, vw0, vw1


def _fold_last_sep(T, n, mode):
    """Fold an (n+2)-wide extended axis (entry e = texel e-1)."""
    core = T[..., 1:n + 1]
    if mode == "zero":
        return core
    lo = T[..., :1]          # texel -1
    hi = T[..., n + 1:]      # texel n
    if mode == "wrap":
        core = core.at[..., n - 1].add(lo[..., 0])
        core = core.at[..., 0].add(hi[..., 0])
    else:  # clamp
        core = core.at[..., 0].add(lo[..., 0])
        core = core.at[..., n - 1].add(hi[..., 0])
    return core


def fold_ext_grad_sep(g_ext, meta, L, B_tex, boundary_mode, C):
    """[C, NTe] apron sums (tap-resolved cols) -> [C, NT] pyramid."""
    parts = []
    eoff = 0
    for lev in range(L):
        _, hl, wl = meta[lev]
        he, we = hl + 2, wl + 2
        n = B_tex * he * we
        E = g_ext[:, eoff:eoff + n].reshape(C, B_tex, he, we)
        eoff += n
        t = _fold_last_sep(E, wl, boundary_mode)
        t = jnp.swapaxes(
            _fold_last_sep(jnp.swapaxes(t, -1, -2), hl, boundary_mode),
            -1, -2)
        parts.append(t.reshape(C, B_tex * hl * wl))
    return jnp.concatenate(parts, axis=-1)


def _pairs_from_bbox(trlo, trhi, tclo, tchi, any_live, wt_cl, tile_off_cl,
                     max_pairs, n_tiles):
    """Expand per-(chunk, level) tile bboxes into a (tile, chunk) pair
    list sorted by tile. Returns (ptile, pchunk, total)."""
    ncl = trlo.shape[0]
    rows = jnp.where(any_live, trhi - trlo + 1, 0)
    cols = jnp.where(any_live, tchi - tclo + 1, 0)
    areas = rows * cols
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(areas, dtype=jnp.int32)])
    total = offs[-1]

    e = jnp.arange(max_pairs, dtype=jnp.int32)
    cell = jnp.clip(
        jnp.searchsorted(offs, e, side="right").astype(jnp.int32) - 1,
        0, ncl - 1)
    k = e - jnp.take(offs, cell)
    ncol = jnp.maximum(jnp.take(cols, cell), 1)
    tr = jnp.take(trlo, cell) + k // ncol
    tc = jnp.take(tclo, cell) + k % ncol
    tile = (jnp.take(tile_off_cl, cell) + tr * jnp.take(wt_cl, cell) + tc)
    live = e < total
    # Dead pairs -> the dummy tile (n_tiles) appended to the output.
    ptile = jnp.where(live, tile, n_tiles)
    pchunk = jnp.where(live, cell, 0)
    order = jnp.argsort(ptile, stable=True).astype(jnp.int32)
    return jnp.take(ptile, order), jnp.take(pchunk, order), total


def _sep_kernel_call(ptile, pchunk_s, ints3, wts4, dyt, lev_tab,
                     C, n_tiles, n_levels, nc, P, interpret):
    """The pair-list kernel: one matmul per (tile, chunk) pair."""
    n_pairs = ptile.shape[0]

    def kernel(ptile_ref, pchunk_ref, ltab_ref, ints_ref,
               wts_ref, dy_ref, _zero_ref, out_ref):
        i = pl.program_id(0)
        t = ptile_ref[i]
        live = t < n_tiles
        znew = jnp.logical_or(
            i == 0, t != ptile_ref[jnp.maximum(i - 1, 0)])

        @pl.when(znew)
        def _():
            out_ref[...] = jnp.zeros((C, 8, LANE), jnp.float32)

        @pl.when(live)
        def _accum():
            # Tile geometry from the level table: row k of ltab =
            # (first_tile, wt = wep//128) per level.
            tbase = jnp.int32(0)
            wt = jnp.int32(1)
            for lev in range(n_levels):
                sel = t >= ltab_ref[lev, 0]
                tbase = jnp.where(sel, ltab_ref[lev, 0], tbase)
                wt = jnp.where(sel, ltab_ref[lev, 1], wt)
            local = t - tbase
            r0 = (local // wt) * 8
            c0 = (local % wt) * LANE

            rv = ints_ref[0:1] - r0     # [1, P] tap-0 row, tile-local
            cu = ints_ref[1:2] - c0
            base_ok = ints_ref[2:3] == tbase

            vw0 = jnp.where(base_ok, wts_ref[0:1], 0.0)
            vw1 = jnp.where(base_ok, wts_ref[1:2], 0.0)
            rr = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
            av = vw0 * (rr == rv) + vw1 * (rr == rv + 1)  # [8, P]

            rows = [av * dy_ref[c:c + 1] for c in range(C)]
            ast = jnp.concatenate(rows, axis=0)  # [8C, P]
            z0 = ast * wts_ref[2:3]
            z1 = ast * wts_ref[3:4]

            # ONE column one-hot serves both u-taps: Y0 lands tap du=0
            # at col cu; the du=1 tap's [cc == cu+1] matmul equals Y1
            # lane-shifted right by one, plus a rank-1 correction for
            # cu == -1 (tap0 left of the tile, tap1 at col 0).
            cc = jax.lax.broadcasted_iota(jnp.int32, (LANE, P), 0)
            oh0 = (cc == cu).astype(jnp.float32)  # [128, P]
            dn = (((1,), (1,)), ((), ()))
            y0 = jax.lax.dot_general(
                z0, oh0, dimension_numbers=dn,
                preferred_element_type=jnp.float32)  # [8C, 128]
            y1 = jax.lax.dot_general(
                z1, oh0, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            m1 = (cu == -1).astype(jnp.float32)  # [1, P]
            col0 = jax.lax.dot_general(
                z1, m1, dimension_numbers=dn,
                preferred_element_type=jnp.float32)  # [8C, 1]
            y1s = jnp.concatenate([col0, y1[:, :LANE - 1]], axis=1)
            g = y0 + y1s
            out_ref[...] += g.reshape(C, 8, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((3, P), lambda i, pt, pc, lt: (0, pc[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, P), lambda i, pt, pc, lt: (0, pc[i]),
                         memory_space=pltpu.VMEM),
            # dy repeats per mip slot: chunk index modulo nc.
            pl.BlockSpec((C, P), lambda i, pt, pc, lt: (0, pc[i] % nc),
                         memory_space=pltpu.VMEM),
            # Donated zero buffer (aliased to the output): never read
            # by the kernel; untouched tiles keep its zeros.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, 8, LANE), lambda i, pt, pc, lt: (0, pt[i], 0),
            memory_space=pltpu.VMEM),
    )
    zeros = jnp.zeros((C, (n_tiles + 1) * 8, LANE), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, (n_tiles + 1) * 8, LANE),
                                       jnp.float32),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(ptile, pchunk_s, lev_tab, ints3, wts4, dyt, zeros)
    return out[:, :n_tiles * 8]


def lattice_scatter_grad(ut, vt, dyt, slots, emeta_t, meta, L,
                         boundary_mode, C, fallback, interpret=False):
    """Texture gradient on the tiled apron pyramid, separable form.

    Args:
      ut, vt: [Np] tile-major uv.
      dyt: [C, Np] tile-major color cotangent (level-weight lw is
        folded into the row factors, not dy).
      slots: ((lsel [Np] int32, lw [Np]) per mip slot).
      emeta_t: texture_pallas.ext_meta_tiled rows
        ((eoff_t, hl, wl, hep, wep) per level) — requires B_tex == 1.
      meta: ((off, hl, wl) per level); L: levels.
      fallback: () -> [C, NT] generic-scatter path, used when the pair
        list overflows.

    Returns [C, NT] pyramid gradient (row-major level layout).
    """
    Np = ut.shape[0]
    n_slots = len(slots)
    n_tiles = (emeta_t[-1][0] >> 10) + ((emeta_t[-1][3] * emeta_t[-1][4])
                                        >> 10)
    P = _pick_p(n_tiles, Np * n_slots)
    nc = _cdiv(Np, P)
    Npp = nc * P

    hl_a = jnp.asarray([e[1] for e in emeta_t], jnp.int32)
    wl_a = jnp.asarray([e[2] for e in emeta_t], jnp.int32)
    wep_a = jnp.asarray([e[4] for e in emeta_t], jnp.int32)
    toff_a = jnp.asarray([e[0] >> 10 for e in emeta_t], jnp.int32)
    wt_a = jnp.asarray([e[4] >> 7 for e in emeta_t], jnp.int32)

    def padP(x, fill=0):
        if Npp != Np:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Npp - Np)],
                        constant_values=fill)
        return x

    ints_s = []
    wts_s = []
    lsel_s = []
    for lsel, lw in slots:
        hl = jnp.take(hl_a, lsel)
        wl = jnp.take(wl_a, lsel)
        jun, jvn, uw0, uw1, vw0, vw1 = lattice_setup_sep(
            ut, vt, hl, wl, boundary_mode)
        base_t = jnp.take(toff_a, lsel)
        ints_s.append(jnp.stack([jvn, jun, base_t]))
        wts_s.append(jnp.stack([lw * vw0, lw * vw1, uw0, uw1]))
        lsel_s.append(lsel)
    # Pad each slot's stream so chunk boundaries align with P.
    ints3 = jnp.concatenate([padP(a) for a in ints_s], axis=-1)
    wts4 = jnp.concatenate([padP(a) for a in wts_s], axis=-1)
    lsel_f = jnp.concatenate([padP(a[None], fill=-1)[0]
                              for a in lsel_s], axis=-1)
    dyt_p = padP(dyt)

    # Per-(chunk, level) tile bounding boxes (superset-safe).
    nct = n_slots * nc
    jvn_f = ints3[0].reshape(nct, P)
    jun_f = ints3[1].reshape(nct, P)
    lsel_c = lsel_f.reshape(nct, P)
    big = jnp.int32(1 << 30)
    trlo_l = []
    trhi_l = []
    tclo_l = []
    tchi_l = []
    live_l = []
    wt_l = []
    toff_l = []
    for lev in range(L):
        m = lsel_c == lev
        trlo_l.append(jnp.where(m, jvn_f >> 3, big).min(axis=-1))
        trhi_l.append(jnp.where(m, (jvn_f + 1) >> 3, -1).max(axis=-1))
        tclo_l.append(jnp.where(m, jun_f >> 7, big).min(axis=-1))
        tchi_l.append(jnp.where(m, (jun_f + 1) >> 7, -1).max(axis=-1))
        live_l.append(m.any(axis=-1))
        wt_l.append(jnp.full((nct,), wt_a[lev]))
        toff_l.append(jnp.full((nct,), toff_a[lev]))
    trlo = jnp.concatenate(trlo_l)
    trhi = jnp.concatenate(trhi_l)
    tclo = jnp.concatenate(tclo_l)
    tchi = jnp.concatenate(tchi_l)
    any_live = jnp.concatenate(live_l)
    wt_cl = jnp.concatenate(wt_l)
    toff_cl = jnp.concatenate(toff_l)
    # cell -> chunk index (cells are (lev, chunk) row-major by lev).
    cell_chunk = jnp.tile(jnp.arange(nct, dtype=jnp.int32), (L,))

    max_pairs = _PAIR_FACTOR * nct + _PAIR_TILE_FACTOR * n_tiles
    ptile, pcell, total = _pairs_from_bbox(
        trlo, trhi, tclo, tchi, any_live, wt_cl, toff_cl, max_pairs,
        n_tiles)
    pchunk = jnp.take(cell_chunk, pcell)

    lev_tab = jnp.stack([toff_a, wt_a], axis=-1)  # [L, 2]

    def sep_path(_):
        g_t = _sep_kernel_call(ptile, pchunk, ints3, wts4, dyt_p,
                               lev_tab, C, n_tiles, L, nc, P, interpret)
        # tiled [C, n_tiles*8, 128] -> row-major apron -> fold.
        from .texture_pallas import untile_ext_grad
        B_tex = 1
        g_ext = untile_ext_grad(
            g_t.reshape(C, n_tiles * 8 * LANE), emeta_t, L, B_tex)
        return fold_ext_grad_sep(g_ext, meta, L, B_tex, boundary_mode, C)

    return jax.lax.cond(total <= max_pairs, sep_path,
                        lambda _: fallback(), 0)
