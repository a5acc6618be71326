"""Pallas TPU fused rasterizer (coverage + shading in one pass).

TPU-shaped replacement for CudaRaster's bin/coarse/fine stages plus the
per-pixel forward shader (csrc/common/cudaraster/impl/{BinRaster,
CoarseRaster,FineRaster}.inl and csrc/common/rasterize.cu:15-114),
re-designed around the TPU's strengths:

* **Binning** (XLA): subtriangles are sorted by the (rowband, column
  tile) of their screen AABB, grouped into GROUP=8-subtriangle groups
  with precomputed group AABBs — the sort-based, statically-shaped
  substitute for CudaRaster's atomic segment allocators.
* **Pixel phase** (Pallas): grid (batch, rowband, coltile, chunk); the
  output tile stays resident in VMEM across the chunk axis
  (accumulator pattern). Each chunk DMA brings CHUNK subtriangle
  records; per-group AABB tests (scalar, SMEM) skip non-overlapping
  work, and surviving groups evaluate 8 affine edge functions over a
  32x128 pixel region on the VPU.
* **Depth test without divides**: the running per-pixel minimum is the
  lexicographic (z/w, id) order evaluated by cross-multiplication
  (z_c * w_a < z_a * w_c, both w > 0) — the deterministic-ROP
  equivalent of FineRaster.inl:152-172 with *lowest triangle index
  wins depth ties*, and no atomics.
* **Fused shading**: every per-triangle quantity the reference's
  forward shader gathers per pixel (rasterize.cu:15-114) is an affine
  function of the pixel center, so the winning triangle's parent edge
  values and plane coefficients are accumulated alongside the depth
  test. The final grid step converts them to (u, v, z/w, id) and the
  bary pixel differentials in-register — no per-pixel gather anywhere.
* **Depth peeling** reads the previous layer's depth image and culls
  fragments with depth <= peel (FineRaster.inl:349) — fused into the
  same candidate test.

Record layout per triangle (16 f32; GROUP=8 records lane-packed into
one 128-float row so the stream fills whole vregs):
  [0:9]   edge functions, affine (c, d/dfx, d/dfy) x 3
          (winding-normalized parent edges — they double as the
          barycentric numerators; a_i = lambda_i * pD / w_hit makes
          all-positive exactly the front-side ray hits)
  [9:12]  z plane (affine)
  [12:15] w plane (affine)
  [15]    triangle_id + 1 as float (exact for ids < 2^24), or 1e30
          when the slot is invalid
The near-plane clip is the affine in-kernel cut test
``pw >= eps * (a0+a1+a2)`` — no subtriangles are materialized
(the clip polygon is computed only to bound screen AABBs).

Range-mode per-image triangle windows are enforced in-kernel from the
(start, count) scalars, so geometry records are shared across the
minibatch exactly like the reference's range mode (ops.py:93-135).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
LANE = 128
MAX_TILE_W = 1024
GROUP = 8
SLAB_H = 16
MAX_CHUNK = 512
# Largest record chunk: fewer grid steps for big meshes (measured ~12%
# on an 81k-tri forward); 8192 records = 1 MB coefficient block, still
# comfortably double-buffered in VMEM. Small meshes adapt downward.
CHUNK_CAP = 8192
_REMAP_MAX_ENTRIES = 16384  # SMEM budget for the chunk remap table

# Largest triangle count served by this kernel (float32-exact ids).
MAX_PALLAS_TRIS = 1 << 24

_BIG = 1e30
_ID_INVALID = 1e30
_ID_VALID_THRESH = 1e29
# Near-plane guard; must match rasterize._W_CLIP_EPS.
_CLIP_EPS = 1e-9


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Binning (XLA).
# ---------------------------------------------------------------------------

# Per-edge error bound, in units of the coefficient magnitude sum
# |c0| + |cx| + |cy|:
#   construction — each coefficient is rasterize._dop's correctly-
#     rounded f32 difference of exact f64 products: <= (0.5 + 2^-29)
#     ulp32 (true f64), <= (0.5 + 2^-20) ulp32 under XLA:TPU's
#     float-float f64 emulation; 1.01 * 2^-24 * |c| covers both.
#   evaluation — three f32 roundings of (c0 + cx*fx) + cy*fy at
#     |fx|, |fy| <= 1 (any contraction scheme only removes roundings),
#     plus the rounding of fx/fy themselves: 3 * 2^-24 * sum.
_SLOP_KAPPA = (1.01 + 3.0) * 2.0 ** -24
# Subnormal floor: the half-ulp construction/eval roundings never fall
# below ~2^-150 absolute regardless of |c|; 3 * 2^-126 covers all
# three coefficients with orders of magnitude to spare.
_SLOP_ABS_FLOOR = 3.0 * 2.0 ** -126
# Safety margin on the perturbation geometry (its own f32 roundings
# are relatively tiny; 1.25 is generous).
_SLOP_MARGIN = 1.25


def _coverage_slop(tv):
    """Sound binning expansion (clip-fraction units) per triangle.

    The kernel's coverage test evaluates the f32 *record coefficients*
    (products of clip coords, see rasterize._edge_coeffs), not exact
    edge lines — so the coverable set is contained in
    ``{a_k >= -E_k for all k}`` where ``E_k`` bounds edge k's combined
    construction + evaluation rounding over the screen. Displacing
    each edge line by E_k moves each coverage-polytope vertex (the
    intersection of edge lines k, l) by at most
    ``(E_k*|grad_l| + E_l*|grad_k|) / |cross(grad_k, grad_l)|``
    (2x2 linear perturbation). The max over the three vertex pairs
    bounds how far the pixels the kernel can claim extend beyond the
    projected triangle, so binning by AABB + slop is sound against the
    kernel's own arithmetic.

    E_k is _SLOP_KAPPA * (|c0| + |cx| + |cy|) + _SLOP_ABS_FLOOR on the
    coefficients the records actually carry (the same rasterize._dop
    values, recomputed here): correctly-rounded construction is within
    ~0.5 ulp OF THE COEFFICIENT, so — unlike the earlier Dekker-twoProd
    bound on plain-f32 construction, whose |e1| + |e2| terms scale with
    the PRODUCT magnitudes — cancelling slivers no longer inflate the
    bound. The near-clip cut / pw>0 / |pz|<=pw tests only intersect
    (shrink) coverage, so edge pairs alone bound it.

    Args:
      tv: [..., 3, 4] parent clip-space vertices.
    Returns:
      [...] f32 slop; large (possibly inf -> caller clips) for slivers.
    """
    from .rasterize import _dop

    x, y, w = tv[..., 0], tv[..., 1], tv[..., 3]

    def edge(j, k):
        xj, yj, wj = x[..., j], y[..., j], w[..., j]
        xk, yk, wk = x[..., k], y[..., k], w[..., k]
        # The records' own coefficients (bitwise _edge_coeffs values).
        c0 = _dop(xj, yk, xk, yj)
        cx = _dop(yj, wk, wj, yk)
        cy = _dop(wj, xk, xj, wk)
        ek = (_SLOP_KAPPA * (jnp.abs(c0) + jnp.abs(cx) + jnp.abs(cy))
              + _SLOP_ABS_FLOOR)
        return ek, jnp.sqrt(cx * cx + cy * cy), cx, cy

    e = [edge(1, 2), edge(2, 0), edge(0, 1)]
    slop = jnp.zeros(tv.shape[:-2], jnp.float32)
    for k in range(3):
        ek, gk, cxk, cyk = e[k]
        el, gl, cxl, cyl = e[(k + 1) % 3]
        d = jnp.abs(cxk * cyl - cyk * cxl)
        delta = jnp.where(d > 0, (ek * gl + el * gk)
                          / jnp.maximum(d, 1e-38), _BIG)
        slop = jnp.maximum(slop, delta)
    return _SLOP_MARGIN * slop


# ---------------------------------------------------------------------------
# Channel-major prepass. Per-triangle data travel as per-coordinate
# flat [.., T] arrays: the tensor forms ([T, 3, 4] vertices,
# [T, 2, 3, 4] clip polygons, [T, 16] records) tile-pad their minor
# dims to (8, 128) in HBM — 32-85x inflation, ~12 GB of traffic at 1M
# triangles, measured as ~70 ms of the 94 ms binning prepass
# (benchmarks/results_r4.md "Binning prepass split"). Same layout rule
# as per-pixel data (scatter.py docstring). Every expression below
# mirrors the rasterize.py helpers term-for-term, so results are
# bitwise identical.
# ---------------------------------------------------------------------------

def _gather_tri_cols(pos, tri):
    """Vertex coordinates as per-coordinate flats.

    pos: [B, V, 4] or [V, 4]; tri: [T, 3].
    Returns (x, y, z, w): tuples of 3 arrays [.., T] (vertex j of the
    triangle). One [.., 4, V] transpose up front keeps every gather
    and all downstream math in clean (minor = T) layouts.
    """
    pt = jnp.swapaxes(pos, -1, -2)  # [.., 4, V]
    g = [jnp.take(pt, tri[:, j], axis=-1) for j in range(3)]  # [.., 4, T]
    x = tuple(gj[..., 0, :] for gj in g)
    y = tuple(gj[..., 1, :] for gj in g)
    z = tuple(gj[..., 2, :] for gj in g)
    w = tuple(gj[..., 3, :] for gj in g)
    return x, y, z, w


def _edge_coeffs_cols(x, y, w):
    """rasterize._edge_coeffs on coordinate flats.

    Returns e[k] = (c0, cx, cy) for k = 0..2 (edge k opposite vertex
    k: (1,2), (2,0), (0,1)).

    Correctly-rounded differences of products (rasterize._dop): exact
    negation symmetry for shared/opposed edges regardless of the
    backend's fma contraction, jit/eager-deterministic, and
    bitwise-duplicate (x,y,w) pairs give exact-zero coefficients
    (rationale at rasterize._edge_coeffs)."""
    from .rasterize import _dop

    def edge(j, kk):
        c0 = _dop(x[j], y[kk], x[kk], y[j])
        cx = _dop(y[j], w[kk], w[j], y[kk])
        cy = _dop(w[j], x[kk], x[j], w[kk])
        return (c0, cx, cy)

    return (edge(1, 2), edge(2, 0), edge(0, 1))


def _canon_pair(x, y, w, j, kk):
    """(swap, eq) for the value-canonical order of vertex pair (j, kk):
    swap = (x,y,w)[kk] lexicographically below (x,y,w)[j]; eq = all
    three coordinates bitwise equal (as values; -0.0 == 0.0 is fine —
    equal VALUES produce identically-rounded products either way)."""
    swap = (x[kk] < x[j]) | ((x[kk] == x[j])
                             & ((y[kk] < y[j])
                                | ((y[kk] == y[j]) & (w[kk] < w[j]))))
    eq = (x[j] == x[kk]) & (y[j] == y[kk]) & (w[j] == w[kk])
    return swap, eq


def _coverage_slop_cols(x, y, w):
    """_coverage_slop on coordinate flats (same bound; ideally the
    caller passes the already-built edge coefficients — see
    _coverage_slop_from_edges)."""
    e_coef = _edge_coeffs_cols(x, y, w)
    return _coverage_slop_from_edges(e_coef)


def _coverage_slop_from_edges(e_coef):
    """_coverage_slop's bound from prebuilt edge coefficients
    (e_coef[k] = (c0, cx, cy) flats) — shares the _dop work with the
    record build instead of recomputing it."""
    def edge(k):
        c0, cx, cy = e_coef[k]
        ek = (_SLOP_KAPPA * (jnp.abs(c0) + jnp.abs(cx) + jnp.abs(cy))
              + _SLOP_ABS_FLOOR)
        return ek, jnp.sqrt(cx * cx + cy * cy), cx, cy

    e = [edge(0), edge(1), edge(2)]
    slop = jnp.zeros(e_coef[0][0].shape, jnp.float32)
    for k in range(3):
        ek, gk, cxk, cyk = e[k]
        el, gl, cxl, cyl = e[(k + 1) % 3]
        d = jnp.abs(cxk * cyl - cyk * cxl)
        delta = jnp.where(d > 0, (ek * gl + el * gk)
                          / jnp.maximum(d, 1e-38), _BIG)
        slop = jnp.maximum(slop, delta)
    return _SLOP_MARGIN * slop


def _near_clip_cols(x, y, w):
    """rasterize._near_clip_subtris on coordinate flats (x, y, w only —
    the z column is never consumed by the AABB).

    Returns (sx, sy, sw, valid): s*[slot][vert] flats ([.., T]) for the
    2 subtriangle slots, and valid[slot] bools.
    """
    from .rasterize import _W_CLIP_EPS

    inside = [wj >= _W_CLIP_EPS for wj in w]
    n_in = (inside[0].astype(jnp.int32) + inside[1].astype(jnp.int32)
            + inside[2].astype(jnp.int32))

    i0, i1, i2 = inside
    k_one = jnp.where(i0, 0, jnp.where(i1, 1, 2))
    k_two = jnp.where(~i2, 0, jnp.where(~i0, 1, 2))
    k = jnp.where(n_in == 1, k_one, jnp.where(n_in == 2, k_two, 0))

    def rot(vals, j):
        # r_j = vals[(k + j) % 3] via selects (take_along_axis analog).
        return jnp.where(k == 0, vals[j % 3],
                         jnp.where(k == 1, vals[(j + 1) % 3],
                                   vals[(j + 2) % 3]))

    r = [tuple(rot(c, j) for c in (x, y, w)) for j in range(3)]

    def isect(p, q):
        denom = q[2] - p[2]
        safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        t = jnp.clip((_W_CLIP_EPS - p[2]) / safe, 0.0, 1.0)
        return tuple(pc + t * (qc - pc) for pc, qc in zip(p, q))

    i01 = isect(r[0], r[1])
    i02 = isect(r[0], r[2])
    i12 = isect(r[1], r[2])

    case_all = n_in == 3
    case_one = n_in == 1
    case_two = n_in == 2

    def sel(c, a, b):
        return jnp.where(c, a, b)

    # c==3: (r0, r1, r2); c==1: (r0, i01, i02); c==2: (r0, r1, i12).
    s0 = [r[0],
          tuple(sel(case_one, a, b) for a, b in zip(i01, r[1])),
          tuple(sel(case_one, a,
                    sel(case_two, b, c))
                for a, b, c in zip(i02, i12, r[2]))]
    s1 = [r[0], i12, i02]

    sx = [[v[0] for v in s0], [v[0] for v in s1]]
    sy = [[v[1] for v in s0], [v[1] for v in s1]]
    sw = [[v[2] for v in s0], [v[2] for v in s1]]
    valid = [case_all | case_one | case_two, case_two]
    return sx, sy, sw, valid


def _aabb_union_cols(sx, sy, sw, svalid, ok_tri, slop, H, W, y0, Hf):
    """_pixel_aabb + slot union on coordinate flats (same arithmetic:
    per-vertex projection, per-slot min/max + guard band, slot union).
    ok_tri folds the triangle-level cull into both slots."""
    gx = 0.5 + jnp.clip(slop * (W * 0.5), 0.0, 1e9)
    gy = 0.5 + jnp.clip(slop * (Hf * 0.5), 0.0, 1e9)
    y0f = jnp.asarray(y0, jnp.float32)

    u_xmin = u_ymin = None
    u_xmax = u_ymax = None
    u_ok = None
    for s in range(2):
        pxs = []
        pys = []
        for v in range(3):
            wv = jnp.maximum(sw[s][v], 1e-12)
            pxs.append(jnp.clip((sx[s][v] / wv + 1.0) * (W * 0.5) - 0.5,
                                -1e9, 1e9))
            pys.append(jnp.clip((sy[s][v] / wv + 1.0) * (Hf * 0.5) - 0.5
                                - y0f, -1e9, 1e9))
        xmin = jnp.minimum(jnp.minimum(pxs[0], pxs[1]), pxs[2]) - gx
        xmax = jnp.maximum(jnp.maximum(pxs[0], pxs[1]), pxs[2]) + gx
        ymin = jnp.minimum(jnp.minimum(pys[0], pys[1]), pys[2]) - gy
        ymax = jnp.maximum(jnp.maximum(pys[0], pys[1]), pys[2]) + gy
        onscreen = ((xmax >= -0.5) & (xmin <= W - 0.5)
                    & (ymax >= -0.5) & (ymin <= H - 0.5))
        ok = svalid[s] & ok_tri & onscreen
        xmin = jnp.where(ok, xmin, _BIG)
        ymin = jnp.where(ok, ymin, _BIG)
        xmax = jnp.where(ok, xmax, -_BIG)
        ymax = jnp.where(ok, ymax, -_BIG)
        if u_xmin is None:
            u_xmin, u_ymin, u_xmax, u_ymax, u_ok = xmin, ymin, xmax, ymax, ok
        else:
            u_xmin = jnp.minimum(u_xmin, xmin)
            u_ymin = jnp.minimum(u_ymin, ymin)
            u_xmax = jnp.maximum(u_xmax, xmax)
            u_ymax = jnp.maximum(u_ymax, ymax)
            u_ok = u_ok | ok
    return u_xmin, u_ymin, u_xmax, u_ymax, u_ok


def _build_records_cm(pos, tri, tri_ids):
    """Channel-major _build_records: records as [.., 16, T] plus the
    AABB inputs as flats. Same formulas as _build_records (cited
    there). Edge rows, slop, and AABBs are bitwise identical to the
    tensor-form builder; the z/w plane rows can differ by ~1 ulp from
    rasterize._plane_coeffs' einsum (different 3-term summation order,
    measured max 4e-6 absolute) — within both impls every consumer
    sees one consistent set of coefficients, so watertightness and
    CSR/remap exactness are unaffected."""
    x, y, z, w = _gather_tri_cols(pos, tri)
    e = _edge_coeffs_cols(x, y, w)
    # Plane coefficients (rasterize._plane_coeffs einsum unrolled).
    zc = tuple(z[0] * e[0][c] + z[1] * e[1][c] + z[2] * e[2][c]
               for c in range(3))
    wc = tuple(w[0] * e[0][c] + w[1] * e[1][c] + w[2] * e[2][c]
               for c in range(3))
    # Winding normalization (rasterize._area_form). The barrier pins po
    # to ONE evaluation: XLA otherwise re-fuses pD's mul-add chain into
    # each of the 15 record rows with per-site FMA contraction, and on
    # an exactly-degenerate triangle (pD = +-1 ulp of noise) the sign
    # can differ BETWEEN ROWS — breaking the exact-negation pairing of
    # shared/opposed edges that the watertight tie rule requires.
    pD = e[0][0] * w[0] + e[0][1] * x[0] + e[0][2] * y[0]
    po = jax.lax.optimization_barrier(jnp.where(pD < 0, -1.0, 1.0))

    sx, sy, sw, svalid = _near_clip_cols(x, y, w)
    # Cull triangles with a bitwise-duplicate (x,y,w) vertex pair: the
    # canonical edge builder gives them an exact-zero edge row, which
    # would otherwise leave coverage to the tie rule over the
    # remaining (noise-level) rows.
    dup = (_canon_pair(x, y, w, 0, 1)[1]
           | _canon_pair(x, y, w, 1, 2)[1]
           | _canon_pair(x, y, w, 2, 0)[1])
    valid = (pD != 0.0) & ~dup & (svalid[0] | svalid[1])

    lead = x[0].shape[:-1]
    T = x[0].shape[-1]
    idf = jnp.broadcast_to(tri_ids.astype(jnp.float32) + 1.0, lead + (T,))
    idf = jnp.where(valid, idf, _ID_INVALID)

    rows = []
    for k in range(3):
        for c in range(3):
            rows.append(jnp.where(valid, e[k][c] * po, 0.0))
    for c in range(3):
        rows.append(jnp.where(valid, zc[c] * po, 0.0))
    for c in range(3):
        rows.append(jnp.where(valid, wc[c] * po, 0.0))
    rows.append(idf)
    rec_cm = jnp.stack(rows, axis=-2)  # [.., 16, T]
    # Slop from the SAME edge coefficients (po-invariant magnitudes) —
    # no recomputation of the _dop products.
    slop = _coverage_slop_from_edges(e)
    return rec_cm, (sx, sy, sw, svalid), valid, slop


def _pack_records(rec_cm):
    """[.., 16, S] -> [.., S/8, 128] lane-packed GROUP rows
    (packed[.., g, k*16 + f] = rec_cm[.., f, g*8 + k]).

    One transpose + reshape: the equivalent 128-slice jnp.stack was
    measured at 48 ms for 3.4M records on TPU (the stack's consumers
    re-materialize the producer per slice), vs a single optimized
    transpose here (benchmarks/profile_csrtail.py)."""
    S = rec_cm.shape[-1]
    lead = rec_cm.shape[:-2]
    n = len(lead)
    arr = rec_cm.reshape(lead + (16, S // GROUP, GROUP))
    arr = jnp.transpose(arr, tuple(range(n)) + (n + 1, n + 2, n))
    return arr.reshape(lead + (S // GROUP, GROUP * 16))


def _pixel_aabb(sub, ok, H, W, y0, Hf, slop=None):
    """Screen AABB per subtriangle in band-local pixel-index units
    (empty if !ok). y0/Hf: row offset and full image height of the
    viewport (band rows cover [y0, y0 + H) of the Hf-tall image).

    slop: optional per-record coverage-soundness expansion in
    clip-fraction units (see _coverage_slop) — broadcast against the
    slot axis. It bounds how far the kernel's f32-coefficient coverage
    polytope can extend beyond the projected true triangle, so the
    binning box provably contains every pixel the kernel can cover.
    """
    x = sub[..., 0]
    y = sub[..., 1]
    w = jnp.maximum(sub[..., 3], 1e-12)
    px = jnp.clip((x / w + 1.0) * (W * 0.5) - 0.5, -1e9, 1e9)
    py = jnp.clip((y / w + 1.0) * (Hf * 0.5) - 0.5
                  - jnp.asarray(y0, jnp.float32), -1e9, 1e9)
    # Half-pixel guard band: binning boxes come from f32-rounded
    # projected (clip-polygon) vertices while coverage is the exact
    # affine edge + cut test, so a rounding sliver could otherwise bin
    # away a covered pixel at a tile/slab boundary. Expansion only
    # loosens group/tile-level candidate tests (conservative).
    gx = gy = 0.5
    if slop is not None:
        # Clip-fraction -> pixel units (fx = px * 2/W + xo).
        gx = gx + jnp.clip(slop * (W * 0.5), 0.0, 1e9)[..., None]
        gy = gy + jnp.clip(slop * (Hf * 0.5), 0.0, 1e9)[..., None]
    xmin = jnp.min(px, axis=-1) - gx
    xmax = jnp.max(px, axis=-1) + gx
    ymin = jnp.min(py, axis=-1) - gy
    ymax = jnp.max(py, axis=-1) + gy
    onscreen = ((xmax >= -0.5) & (xmin <= W - 0.5) &
                (ymax >= -0.5) & (ymin <= H - 0.5))
    ok = ok & onscreen
    xmin = jnp.where(ok, xmin, _BIG)
    ymin = jnp.where(ok, ymin, _BIG)
    xmax = jnp.where(ok, xmax, -_BIG)
    ymax = jnp.where(ok, ymax, -_BIG)
    return xmin, ymin, xmax, ymax, ok


def _stable_order(key, n_key):
    """Stable ascending order of small-int keys (invalid = n_key).

    Packs (key, slot) into ONE int32 and runs a single-operand
    lax.sort — half the sort traffic of jnp.argsort's (key, iota)
    variadic sort, which profiling showed dominating the big-mesh
    binning prepass. Falls back to argsort when the pack would
    overflow int31 (huge meshes / very fine tile grids).

    Args:
      key: [S] int32 in [0, n_key] (n_key = invalid sentinel).
      n_key: static int.
    Returns (order [S] int32, key_sorted [S] int32).
    """
    S = key.shape[0]
    ib = max(1, (S - 1).bit_length())
    if (n_key + 1) << ib <= (1 << 31):
        packed = jax.lax.sort(key << ib | jnp.arange(S, dtype=jnp.int32))
        return packed & ((1 << ib) - 1), packed >> ib
    order = jnp.argsort(key, stable=True)
    return order, key[order]


def _sort_records(rec_cm, aabb, nty, ntx, tile_w):
    """Locality-sort records; emit per-group AABBs.

    rec_cm: [16, S] channel-major records; aabb: tuple of [S] arrays.

    Returns (records lane-packed [S/GROUP, GROUP*16], gaabb
    [S/GROUP, 4]); the caller derives per-chunk AABBs by reshaping
    gaabb.
    """
    xmin, ymin, xmax, ymax, ok = aabb
    band = jnp.clip(jnp.floor((ymin + 0.5) / TILE_H).astype(jnp.int32),
                    0, nty - 1)
    tx0 = jnp.clip(jnp.floor((xmin + 0.5) / tile_w).astype(jnp.int32),
                   0, ntx - 1)
    nk = nty * ntx
    key = jnp.where(ok, band * ntx + tx0, nk)
    order, _ = _stable_order(key, nk)

    records_s = rec_cm[:, order]
    xmin_s, ymin_s = xmin[order], ymin[order]
    xmax_s, ymax_s = xmax[order], ymax[order]

    ng = rec_cm.shape[-1] // GROUP

    def greduce(v, red):
        return red(v.reshape(ng, GROUP), axis=1)

    gaabb = jnp.stack([
        greduce(xmin_s, jnp.min), greduce(ymin_s, jnp.min),
        greduce(xmax_s, jnp.max), greduce(ymax_s, jnp.max)], axis=-1)
    return _pack_records(records_s), gaabb


def _csr_layout(rec_cm, aabb, nty, ntx, tile_w, chunk):
    """Per-tile CSR record segments for big meshes.

    Classifies each record by its screen-AABB tile span into one of
    ``nty*ntx`` local-tile segments (AABB inside one tile), ``nty``
    band segments (one rowband, several column tiles), or one global
    segment (spans rowbands); lays the records out in chunk-aligned
    contiguous segments so each tile's sweep walks exactly its own +
    its band's + the global chunks via two scalar-prefetch arrays —
    the TPU equivalent of CudaRaster's per-tile triangle segment lists
    (impl/CoarseRaster.inl:388-601) with static shapes and no atomic
    allocators. Replaces the dense all-chunk sweep beyond the remap
    budget; removes the 16384-entry cliff.

    Args:
      rec_cm: [16, S] float32 channel-major records.
      aabb: (xmin, ymin, xmax, ymax, ok) per record, tile-band-local
        pixel units.
      chunk: records per chunk (multiple of GROUP).

    Returns:
      rec_l: [S_pad/GROUP, GROUP*16] lane-packed laid-out records
        (invalid padding slots).
      gaabb: [S_pad/GROUP, 4] group AABBs in layout order.
      cstart: [n_seg] int32 segment starts (chunk-block units).
      ccnt: [n_seg] int32 segment lengths (chunk-block units).
    """
    xmin, ymin, xmax, ymax, ok = aabb
    S = rec_cm.shape[-1]

    def tix(v, n, scale):
        return jnp.clip(jnp.floor((v + 0.5) / scale).astype(jnp.int32),
                        0, n - 1)

    band0 = tix(ymin, nty, TILE_H)
    band1 = tix(ymax, nty, TILE_H)
    tx0 = tix(xmin, ntx, tile_w)
    tx1 = tix(xmax, ntx, tile_w)
    nk0 = nty * ntx
    n_seg = nk0 + nty + 1  # local tiles, bands, global

    local = (band0 == band1) & (tx0 == tx1)
    bandonly = (band0 == band1) & ~local
    key = jnp.where(local, band0 * ntx + tx0,
                    jnp.where(bandonly, nk0 + band0, nk0 + nty))
    key = jnp.where(ok, key, n_seg)
    order, key_sorted = _stable_order(key, n_seg)

    # Per-segment counts/starts from the SORTED keys: n_seg binary
    # searches over the sorted [S] array instead of a 3M-element
    # scatter-add (part of the measured 28 ms "slotmap" stage,
    # benchmarks/profile_csrtail.py). seg0[k] = first sorted position
    # of segment k.
    seg0 = jnp.searchsorted(
        key_sorted, jnp.arange(n_seg + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)  # [n_seg+1], sorted-order starts
    counts = jnp.diff(seg0)  # [n_seg]
    ccnt = -(-counts // chunk)  # blocks per segment
    cstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(ccnt)])  # [n_seg+1], blocks

    # Slot -> segment mapping at BLOCK granularity: a max-scatter of
    # segment ids at their start blocks + cummax reproduces
    # searchsorted(cstart*chunk, j, 'right')-1 (ties -> largest k, so
    # empty segments resolve identically) with [nb]-sized work instead
    # of a per-slot binary search — the prepass is HBM/sort bound, the
    # old searchsorted alone was tens of ms at 1M tris.
    S_pad = (_cdiv(S, chunk) + n_seg) * chunk  # static upper bound
    nb = S_pad // chunk
    k_blk = jax.lax.cummax(
        jnp.full((nb,), -1, jnp.int32).at[cstart].max(
            jnp.arange(n_seg + 1, dtype=jnp.int32), mode="drop"))
    kc_blk = jnp.clip(k_blk, 0, n_seg - 1)
    r0_blk = (jnp.arange(nb, dtype=jnp.int32) - cstart[kc_blk]) * chunk
    valid_blk = k_blk < n_seg

    def expand(a_blk):  # [nb] -> [S_pad] (static chunk: pure reshape)
        return jnp.broadcast_to(a_blk[:, None], (nb, chunk)).reshape(-1)

    jr = jnp.arange(S_pad, dtype=jnp.int32) % chunk
    r = expand(r0_blk) + jr
    valid_slot = expand(valid_blk) & (r < expand(counts[kc_blk]))
    # One composed gather lays the records out (measured 12.7 ms at
    # 3.4M slots — benchmarks/profile_csrtail.py; a scan of per-chunk
    # dynamic-slice copies was tried and cost ~140 ms in TPU loop
    # overhead despite being "contiguous"). The layout's former 105 ms
    # cost was _pack_records' 128-slice stack, fixed separately.
    src = order[jnp.clip(expand(seg0[kc_blk]) + r, 0, S - 1)]

    safe_cm = jnp.zeros((16, 1), jnp.float32).at[15, 0].set(_ID_INVALID)
    rec_l = jnp.where(valid_slot[None, :], rec_cm[:, src], safe_cm)

    gx0 = jnp.where(valid_slot, xmin[src], _BIG)
    gy0 = jnp.where(valid_slot, ymin[src], _BIG)
    gx1 = jnp.where(valid_slot, xmax[src], -_BIG)
    gy1 = jnp.where(valid_slot, ymax[src], -_BIG)
    ng = S_pad // GROUP

    def greduce(v, red):
        return red(v.reshape(ng, GROUP), axis=1)

    gaabb = jnp.stack([
        greduce(gx0, jnp.min), greduce(gy0, jnp.min),
        greduce(gx1, jnp.max), greduce(gy1, jnp.max)], axis=-1)
    return _pack_records(rec_l), gaabb, cstart[:n_seg], ccnt


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------

def _make_kernel(xs, xo, ys, yo, has_vp, nc, gpc, tile_w, has_peel,
                 use_remap, ntx, bc_many, emit_db=True, use_csr=False,
                 nty=0):
    """Build the fused coverage+shade kernel.

    Accumulator channel mapping during the chunk sweep (all
    [TILE_H, tile_w] f32):
      zbuf <- pz   dudx <- pw    idf  <- idf
      u    <- pa0  v    <- pa1   zw   <- pa2
      dudy <- cx0  dvdx <- cy0   dvdy <- cx1
      scratch: cy1, cx2, cy2
    The final grid step rewrites them in place as the real outputs.

    emit_db=False drops the bary-derivative channels entirely (the
    6 db coefficient selects per candidate and the final-step db math):
    outputs are (u, v, zw, idf, zbuf) with pw carried in scratch.
    Used by the fused render pipeline, whose headline path never
    consumes rast_db.
    """
    xs = float(xs)
    xo = float(xo)
    ys = float(ys)
    yo = float(yo)
    n_xsub = tile_w // LANE

    def kernel(*refs):
        if use_remap or use_csr:
            remap_ref, cnt_ref, ranges_ref, *rest = refs
        else:
            ranges_ref, *rest = refs
        if has_vp:
            y0_ref = rest[0]
            rest = rest[1:]
        if use_remap or use_csr:
            gaabb_ref, coef_ref, *rest = rest
        else:
            caabb_ref, gaabb_ref, coef_ref, *rest = rest
        if has_peel:
            peel_ref = rest[0]
            rest = rest[1:]
        # Viewport row offset (band rendering): global row = local + y0.
        y0i = y0_ref[0, 0] if has_vp else 0
        if emit_db:
            (u_ref, v_ref, zw_ref, idf_ref, dudx_ref, dudy_ref, dvdx_ref,
             dvdy_ref, zbuf_ref, cy1_ref, cx2_ref, cy2_ref) = rest
        else:
            (u_ref, v_ref, zw_ref, idf_ref, zbuf_ref, pw_ref) = rest

        ty = pl.program_id(1)
        tx = pl.program_id(2)
        c = pl.program_id(3)

        @pl.when(c == 0)
        def _():
            zbuf_ref[...] = jnp.full((1, TILE_H, tile_w), _BIG, jnp.float32)
            idf_ref[...] = jnp.full((1, TILE_H, tile_w), _ID_INVALID,
                                    jnp.float32)
            z = jnp.zeros((1, TILE_H, tile_w), jnp.float32)
            z2 = jnp.zeros((TILE_H, tile_w), jnp.float32)
            if emit_db:
                dudx_ref[...] = jnp.ones((1, TILE_H, tile_w), jnp.float32)
                for r in (u_ref, v_ref, zw_ref, dudy_ref, dvdx_ref,
                          dvdy_ref):
                    r[...] = z
                for r in (cy1_ref, cx2_ref, cy2_ref):
                    r[...] = z2
            else:
                pw_ref[...] = jnp.ones((TILE_H, tile_w), jnp.float32)
                for r in (u_ref, v_ref, zw_ref):
                    r[...] = z

        # Tile pixel bounds (pixel-index units).
        ty0 = (ty * TILE_H).astype(jnp.float32)
        ty1 = ty0 + float(TILE_H - 1)
        tx0i = tx * tile_w
        tx0 = tx0i.astype(jnp.float32)
        tx1 = tx0 + float(tile_w - 1)

        # Range-mode triangle window as float id bounds (ids are +1).
        start_f = ranges_ref[0, 0, 0].astype(jnp.float32) + 1.0
        end_f = start_f + ranges_ref[0, 0, 1].astype(jnp.float32)

        if use_remap:
            # Only chunks whose AABB overlaps this tile were enqueued
            # by the scalar-prefetch remap; skip the padded tail.
            bb = pl.program_id(0) if bc_many else 0
            chunk_hit = c < cnt_ref[bb, ty * ntx + tx]
        elif use_csr:
            # CSR sweep: this tile's own segment + its band's + the
            # global segment (cnt_ref holds per-segment block counts).
            bb = pl.program_id(0) if bc_many else 0
            nk0 = nty * ntx
            chunk_hit = c < (cnt_ref[bb, ty * ntx + tx]
                             + cnt_ref[bb, nk0 + ty]
                             + cnt_ref[bb, nk0 + nty])
        else:
            chunk_hit = ((caabb_ref[0, c, 1] <= ty1)
                         & (caabb_ref[0, c, 3] >= ty0)
                         & (caabb_ref[0, c, 0] <= tx1)
                         & (caabb_ref[0, c, 2] >= tx0))

        inv128 = 1.0 / float(LANE)
        inv_slab = 1.0 / float(SLAB_H)
        n_slab = TILE_H // SLAB_H

        def eval_region(sc, slab, sx):
            """Evaluate one group over the SLAB_H x 128 region (slab, sx).

            Everything is 2D [SLAB_H, 128]: candidates are merged
            sequentially with scalar coefficients (`sc`, hoisted per
            group — 3D vreg ops are not Mosaic-lowerable).
            """
            x_lo = pl.multiple_of(sx * LANE, LANE)
            y_lo = pl.multiple_of(slab * SLAB_H, SLAB_H)

            colf = jax.lax.broadcasted_iota(
                jnp.int32, (SLAB_H, LANE), 1).astype(jnp.float32)
            rowf = jax.lax.broadcasted_iota(
                jnp.int32, (SLAB_H, LANE), 0).astype(jnp.float32)
            fxv = (colf + (tx0i + x_lo).astype(jnp.float32)) * xs + xo
            fyv = (rowf + (ty * TILE_H + y_lo
                           + y0i).astype(jnp.float32)) * ys + yo

            dsy = pl.ds(y_lo, SLAB_H)
            dsx = pl.ds(x_lo, LANE)
            if has_peel:
                peel = peel_ref[0, dsy, dsx]

            az = zbuf_ref[0, dsy, dsx]
            aw = dudx_ref[0, dsy, dsx] if emit_db else pw_ref[dsy, dsx]
            aid = idf_ref[0, dsy, dsx]
            a_pa0 = u_ref[0, dsy, dsx]
            a_pa1 = v_ref[0, dsy, dsx]
            a_pa2 = zw_ref[0, dsy, dsx]
            if emit_db:
                a_cx0 = dudy_ref[0, dsy, dsx]
                a_cy0 = dvdx_ref[0, dsy, dsx]
                a_cx1 = dvdy_ref[0, dsy, dsx]
                a_cy1 = cy1_ref[dsy, dsx]
                a_cx2 = cx2_ref[dsy, dsx]
                a_cy2 = cy2_ref[dsy, dsx]

            for k in range(GROUP):
                def s(i):
                    return sc[k][i]

                def aff(i):
                    return s(i) + s(i + 1) * fxv + s(i + 2) * fyv

                a0 = aff(0)
                a1 = aff(3)
                a2 = aff(6)
                # Edges are winding-normalized (interior > 0); pixels
                # exactly on an edge are claimed by exactly one owner
                # (rasterize._tie_bits rule; scalar per edge).
                def tie(i):
                    return (s(i + 2) > 0) | ((s(i + 2) == 0)
                                             & (s(i + 1) > 0))

                cov = (((a0 > 0) | ((a0 == 0) & tie(0)))
                       & ((a1 > 0) | ((a1 == 0) & tie(3)))
                       & ((a2 > 0) | ((a2 == 0) & tie(6))))
                pz = aff(9)
                pw = aff(12)
                cut = aff(16)  # near-clip line, inclusive (silhouette)
                idf = s(15)
                ok = cov & (cut >= 0) & (pw > 0) & (jnp.abs(pz) <= pw)
                ok &= ((idf < _ID_VALID_THRESH) & (idf >= start_f)
                       & (idf < end_f))
                if has_peel:
                    # Rounded-depth peel cull: fl(pz/pw) reproduces the
                    # previous layer's recorded zbuf value bitwise for
                    # the same record at the same pixel, so the prior
                    # winner is culled exactly (no reappearance knife
                    # edge at peel == pz/pw; rationale in
                    # rasterize._rasterize_fwd_core). pw <= 0 lanes are
                    # already false in `ok`.
                    ok &= pz / pw > peel

                pzc = jnp.where(ok, pz, _BIG)
                pwc = jnp.where(ok, pw, 1.0)
                idc = jnp.where(ok, idf, _ID_INVALID)

                lhs = pzc * aw
                rhs = az * pwc
                better = (lhs < rhs) | ((lhs == rhs) & (idc < aid))

                # Parent barycentric numerators ARE the coverage edge
                # values (single-record scheme — no separate evals).
                az = jnp.where(better, pzc, az)
                aw = jnp.where(better, pwc, aw)
                aid = jnp.where(better, idc, aid)
                a_pa0 = jnp.where(better, a0, a_pa0)
                a_pa1 = jnp.where(better, a1, a_pa1)
                a_pa2 = jnp.where(better, a2, a_pa2)
                if emit_db:
                    a_cx0 = jnp.where(better, s(1), a_cx0)
                    a_cy0 = jnp.where(better, s(2), a_cy0)
                    a_cx1 = jnp.where(better, s(4), a_cx1)
                    a_cy1 = jnp.where(better, s(5), a_cy1)
                    a_cx2 = jnp.where(better, s(7), a_cx2)
                    a_cy2 = jnp.where(better, s(8), a_cy2)

            zbuf_ref[0, dsy, dsx] = az
            idf_ref[0, dsy, dsx] = aid
            u_ref[0, dsy, dsx] = a_pa0
            v_ref[0, dsy, dsx] = a_pa1
            zw_ref[0, dsy, dsx] = a_pa2
            if emit_db:
                dudx_ref[0, dsy, dsx] = aw
                dudy_ref[0, dsy, dsx] = a_cx0
                dvdx_ref[0, dsy, dsx] = a_cy0
                dvdy_ref[0, dsy, dsx] = a_cx1
                cy1_ref[dsy, dsx] = a_cy1
                cx2_ref[dsy, dsx] = a_cx2
                cy2_ref[dsy, dsx] = a_cy2
            else:
                pw_ref[dsy, dsx] = aw

        @pl.when(chunk_hit)
        def _():
            def group_body(g, carry):
                # gaabb block is [1, 8, gpc]: coord rows 0-3 on the
                # sublane axis, groups on the lane axis (see the
                # host-side layout note at `gaabb_k`).
                gx0 = gaabb_ref[0, 0, g]
                gy0 = gaabb_ref[0, 1, g]
                gx1 = gaabb_ref[0, 2, g]
                gy1 = gaabb_ref[0, 3, g]

                @pl.when((gy0 <= ty1) & (gy1 >= ty0)
                         & (gx0 <= tx1) & (gx1 >= tx0))
                def _():
                    # Hoist the 16x8 record scalars once per group
                    # (one lane-packed 128-float row per group), and
                    # derive each record's near-clip cut line
                    # pw - eps*(a0+a1+a2) as affine coeffs [16:19].
                    cf = coef_ref[0, pl.ds(g, 1), :]  # [1, 128]
                    sc = []
                    for k in range(GROUP):
                        sk = [cf[0, k * 16 + i] for i in range(16)]
                        sk.append(sk[12] - _CLIP_EPS * (sk[0] + sk[3]
                                                       + sk[6]))
                        sk.append(sk[13] - _CLIP_EPS * (sk[1] + sk[4]
                                                       + sk[7]))
                        sk.append(sk[14] - _CLIP_EPS * (sk[2] + sk[5]
                                                       + sk[8]))
                        sc.append(sk)
                    sx_lo = jnp.maximum(
                        jnp.floor((gx0 - tx0) * inv128).astype(jnp.int32), 0)
                    sx_hi = jnp.minimum(
                        jnp.floor((gx1 - tx0) * inv128).astype(jnp.int32),
                        n_xsub - 1)
                    sy_lo = jnp.maximum(
                        jnp.floor((gy0 - ty0) * inv_slab).astype(jnp.int32),
                        0)
                    sy_hi = jnp.minimum(
                        jnp.floor((gy1 - ty0) * inv_slab).astype(jnp.int32),
                        n_slab - 1)

                    def y_body(slab, carry2):
                        def x_body(sx, carry3):
                            eval_region(sc, slab, sx)
                            return carry3

                        jax.lax.fori_loop(sx_lo, sx_hi + 1, x_body, 0)
                        return carry2

                    jax.lax.fori_loop(sy_lo, sy_hi + 1, y_body, 0)

                return carry

            jax.lax.fori_loop(0, gpc, group_body, 0)

        # Final grid step: convert accumulators to shaded outputs.
        # Math follows the reference forward shader exactly
        # (csrc/common/rasterize.cu:62-113).
        @pl.when(c == nc - 1)
        def _():
            pz = zbuf_ref[0]
            pw = dudx_ref[0] if emit_db else pw_ref[...]
            idf = idf_ref[0]
            pa0 = u_ref[0]
            pa1 = v_ref[0]
            pa2 = zw_ref[0]

            valid = idf < _ID_VALID_THRESH
            iw = 1.0 / (pa0 + pa1 + pa2)
            b0 = jnp.clip(pa0 * iw, 0.0, 1.0)
            b1 = jnp.clip(pa1 * iw, 0.0, 1.0)
            bs = 1.0 / jnp.maximum(b0 + b1, 1.0)
            b0 = b0 * bs
            b1 = b1 * bs
            depth = pz / pw
            zwv = jnp.clip(depth, -1.0, 1.0)

            if not emit_db:
                zero = jnp.zeros_like(b0)

                def sel(v, empty=zero):
                    return jnp.where(valid, v, empty)[None]

                u_ref[...] = sel(b0)
                v_ref[...] = sel(b1)
                zw_ref[...] = sel(zwv)
                idf_ref[...] = sel(idf)
                zbuf_ref[...] = sel(depth, jnp.full_like(b0, jnp.inf))
                return

            cx0 = dudy_ref[0]
            cy0 = dvdx_ref[0]
            cx1 = dvdy_ref[0]
            cy1 = cy1_ref[...]
            cx2 = cx2_ref[...]
            cy2 = cy2_ref[...]

            da0dx = -cx0
            da1dx = -cx1
            da2dx = -cx2
            da0dy = -cy0
            da1dy = -cy1
            da2dy = -cy2
            datdx = da0dx + da1dx + da2dx
            datdy = da0dy + da1dy + da2dy
            dfxdx = xs * iw
            dfydy = ys * iw
            dudx = dfxdx * (b0 * datdx - da0dx)
            dudy = dfydy * (b0 * datdy - da0dy)
            dvdx = dfxdx * (b1 * datdx - da1dx)
            dvdy = dfydy * (b1 * datdy - da1dy)

            zero = jnp.zeros_like(b0)

            def sel(v, empty=zero):
                return jnp.where(valid, v, empty)[None]

            u_ref[...] = sel(b0)
            v_ref[...] = sel(b1)
            zw_ref[...] = sel(zwv)
            idf_ref[...] = sel(idf)
            dudx_ref[...] = sel(dudx)
            dudy_ref[...] = sel(dudy)
            dvdx_ref[...] = sel(dvdx)
            dvdy_ref[...] = sel(dvdy)
            zbuf_ref[...] = sel(depth, jnp.full_like(b0, jnp.inf))

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrapper.
# ---------------------------------------------------------------------------

def _build_records(tv, tri_ids):
    """Per-triangle record tensor [.., T, 16] (see module docstring).

    One record per triangle — the near-clip subtriangle split is gone:
    winding-normalized parent edge functions are positive exactly on
    front-side (w_hit > 0) ray hits (a_i = lambda_i * pD / w_hit), and
    the kernel's affine cut test ``pw >= eps * (a0+a1+a2)`` trims hits
    in front of the near plane — together exactly the coverage of the
    geometrically clipped triangle (reference: impl/Util.inl:134-160).
    The subtriangle *vertices* are still computed, but only to bound
    the visible screen extent (AABBs for binning).
    """
    from .rasterize import (_near_clip_subtris, _edge_coeffs, _plane_coeffs,
                            _area_form, _degenerate_tri_mask)

    pe = _edge_coeffs(tv)  # [.., T, 3, 3]
    zc, wc = _plane_coeffs(tv)  # [.., T, 3]
    # Winding normalization (see rasterize._area_form): planes and
    # edges scaled so edge interiors / interpolated w are positive;
    # degenerate parents culled.
    pD = _area_form(pe, tv)  # [.., T]
    # Barrier: keep po a single evaluation (see _build_records_cm).
    po = jax.lax.optimization_barrier(jnp.where(pD < 0, -1.0, 1.0))
    zc = zc * po[..., None]
    wc = wc * po[..., None]
    pe = pe * po[..., None, None]

    # AABB-only clip (no records from it). Duplicate-vertex cull
    # matches _rasterize_fwd_core / _build_records_cm: a bitwise-dup
    # (x,y,w) pair gives an exact-zero edge row, and pD noise could
    # otherwise keep the triangle alive with garbage coverage.
    sub, svalid = _near_clip_subtris(tv)  # [.., T, 2, 3, 4], [.., T, 2]
    valid = ((pD != 0.0) & ~_degenerate_tri_mask(tv)
             & svalid.any(axis=-1))

    lead = tv.shape[:-3]
    T = tv.shape[-3]
    idf = jnp.broadcast_to(tri_ids.astype(jnp.float32) + 1.0, lead + (T,))
    idf = jnp.where(valid, idf, _ID_INVALID)

    rec = jnp.concatenate([
        pe.reshape(lead + (T, 9)), zc, wc, idf[..., None]], axis=-1)
    # Zero the geometry of invalid slots (keep idf = INVALID).
    safe = jnp.zeros((16,), jnp.float32).at[15].set(_ID_INVALID)
    rec = jnp.where(valid[..., None], rec, safe)
    return rec, sub, svalid & valid[..., None], _coverage_slop(tv)


def rasterize_fused(pos, tri, resolution, ranges, peel_depth=None,
                    interpret=False, viewport=None, emit_db=True,
                    flat=False):
    """Fused Pallas rasterize forward.

    Args:
      pos: [B, V, 4] (instance mode) or [V, 4] (range mode).
      tri: [T, 3] int32.
      resolution: (H, W).
      ranges: [B, 2] int32 (start, count); in instance mode pass the
        full-window placeholder (the kernel masks ids against it).
      peel_depth: optional [B, H, W] previous-layer depth (z/w; +inf
        where empty). Fragments with depth <= peel are culled.
      viewport: optional (y0, full_height) — render rows [y0, y0 + H)
        of a full_height-tall image (y0 may be traced). Band output is
        bit-identical to the same rows of the full render.
      emit_db: compute the bary pixel-differential image. False halves
        the accumulator channels (used by the fused render pipeline).
      flat: return per-channel [B, H, W] buffers instead of stacked
        [B, H, W, 4] images (skips the channel-interleave transpose).

    Returns:
      default: (out [B, H, W, 4], out_db [B, H, W, 4], zbuf [B, H, W]).
      flat=True: tuple of [B, H, W] f32 buffers —
        (u, v, zw, idf, zbuf) if not emit_db else
        (u, v, zw, idf, dudx, dudy, dvdx, dvdy, zbuf).
    """
    from . import coord

    H, W = resolution
    if viewport is None:
        y0, Hf = 0, H
    else:
        y0, Hf = viewport[0], int(viewport[1])
    has_vp = viewport is not None
    instance_mode = pos.ndim > 2
    T = tri.shape[0]
    B = pos.shape[0] if instance_mode else ranges.shape[0]

    nty = _cdiv(H, TILE_H)
    Hp = nty * TILE_H
    wp0 = _cdiv(W, LANE) * LANE
    ntx = _cdiv(wp0, MAX_TILE_W)
    tile_w = LANE * _cdiv(wp0 // LANE, ntx)
    Wp = ntx * tile_w

    tri_ids = jnp.arange(T, dtype=jnp.int32)
    # Channel-major prepass: per-coordinate flats all the way to the
    # lane-packed record stream (see the layout note at
    # _gather_tri_cols — the tensor forms cost ~12 GB of padded HBM
    # traffic at 1M triangles).
    rec_cm, clipc, valid_t, slop_f = _build_records_cm(pos, tri, tri_ids)

    S = T
    # chunk must keep gpc = chunk/GROUP a multiple of 8 (SMEM tiling)
    # and chunk a multiple of 8 (lane packing). Adaptive size: target
    # <= ~64 chunk steps per tile sweep so the grid overhead stays
    # flat as meshes grow; cap at CHUNK_CAP records to keep
    # double-buffering in VMEM.
    target = _cdiv(S, 64)
    chunk = min(CHUNK_CAP, max(MAX_CHUNK, _cdiv(target, 64) * 64),
                _cdiv(S, 8 * GROUP) * 8 * GROUP)
    Sp = _cdiv(S, chunk) * chunk
    nc = Sp // chunk
    gpc = chunk // GROUP

    nty_ = nty
    n_tiles = nty * ntx
    Bc_geom = pos.shape[0] if instance_mode else 1
    use_remap = Bc_geom * n_tiles * nc <= _REMAP_MAX_ENTRIES and nc > 1
    use_csr = (not use_remap) and nc > 1

    def aabb_cols(clip_i, valid_i, slop_i):
        sx_i, sy_i, sw_i, sv_i = clip_i
        return _aabb_union_cols(sx_i, sy_i, sw_i, sv_i, valid_i, slop_i,
                                H, W, y0, Hf)

    cstart = ccnt = caabb = None
    if use_csr:
        # Big meshes: chunk-aligned per-tile/band/global CSR segments.
        def csr_one(rec_i, clip_i, valid_i, slop_i):
            return _csr_layout(rec_i, aabb_cols(clip_i, valid_i, slop_i),
                               nty, ntx, tile_w, chunk)

        if instance_mode:
            rec_s, gaabb, cstart, ccnt = jax.vmap(csr_one)(
                rec_cm, clipc, valid_t, slop_f)
        else:
            rec_s, gaabb, cstart, ccnt = csr_one(rec_cm, clipc, valid_t,
                                                 slop_f)
            rec_s, gaabb = rec_s[None], gaabb[None]
            cstart, ccnt = cstart[None], ccnt[None]
        nc = rec_s.shape[1] * GROUP // chunk
    else:
        def pad_last(a):
            if Sp == S:
                return a
            cfg = [(0, 0)] * (a.ndim - 1) + [(0, Sp - S)]
            return jnp.pad(a, cfg)

        rec_cm = pad_last(rec_cm)
        if Sp != S:
            # Padded slots: invalid id.
            rec_cm = rec_cm.at[..., 15, S:].set(_ID_INVALID)
        clipc = jax.tree.map(pad_last, clipc)
        valid_p = pad_last(valid_t)
        slop_p = pad_last(slop_f)

        def bin_one(rec_i, clip_i, valid_i, slop_i):
            return _sort_records(rec_i,
                                 aabb_cols(clip_i, valid_i, slop_i),
                                 nty, ntx, tile_w)

        if instance_mode:
            rec_s, gaabb = jax.vmap(bin_one)(rec_cm, clipc, valid_p,
                                             slop_p)
        else:
            rec_s, gaabb = bin_one(rec_cm, clipc, valid_p, slop_p)
            rec_s = rec_s[None]
            gaabb = gaabb[None]
    # rec_s is lane-packed [B, S_lay/GROUP, GROUP*16] (_pack_records):
    # the coefficient stream occupies full vregs in VMEM/HBM instead
    # of a 16-of-128-lane padded layout (8x less DMA traffic).

    if not use_csr:
        # Per-chunk AABB from group AABBs (remap/dense paths).
        ga4 = gaabb.reshape(-1, nc, gpc, 4)
        caabb = jnp.stack([
            ga4[..., 0].min(axis=-1), ga4[..., 1].min(axis=-1),
            ga4[..., 2].max(axis=-1), ga4[..., 3].max(axis=-1)], axis=-1)

    Bc = rec_s.shape[0]
    # Kernel layout for group AABBs: [B, nc*8, gpc] — coord rows 0-3 on
    # an 8-padded sublane axis, groups on the minormost axis. SMEM
    # windows pad the minormost dim to 128 lanes, so the natural
    # [gpc, 4] per-chunk block would cost gpc*128 f32 per buffer (1 MB
    # of the 1 MB SMEM at gpc=1024); this layout costs 8*gpc.
    ga_k = gaabb.reshape(Bc, nc, gpc, 4).transpose(0, 1, 3, 2)
    ga_k = jnp.pad(ga_k, ((0, 0), (0, 0), (0, 4), (0, 0)))
    gaabb_k = ga_k.reshape(Bc, nc * 8, gpc)
    # [B, 8, 2]: row-replicated so the SMEM block avoids size-1 dims.
    ranges = jnp.broadcast_to(
        jnp.asarray(ranges, jnp.int32).reshape(B, 1, 2), (B, 8, 2))

    xs_, xo_, ys_, yo_ = coord.pixel_scale_offset(Hf, W)
    has_peel = peel_depth is not None
    y0_in = jnp.broadcast_to(jnp.asarray(y0, jnp.int32).reshape(1, 1),
                             (1, 8)) if has_vp else None

    # Scalar-prefetch chunk remap: enqueue only the chunks whose AABB
    # overlaps each tile, so the auto-pipelined chunk DMA never fetches
    # dead work (the index map repeats the previous block for padded
    # steps, which skips the copy). Gated by SMEM capacity; beyond the
    # budget the CSR segment layout takes over (use_csr above).
    if use_remap:
        ty0g = (jnp.arange(nty, dtype=jnp.float32) * TILE_H)[:, None]
        tx0g = (jnp.arange(ntx, dtype=jnp.float32) * tile_w)[None, :]
        cy0 = caabb[..., 1][:, None, None, :]  # [Bc, 1, 1, nc]
        cy1 = caabb[..., 3][:, None, None, :]
        cx0 = caabb[..., 0][:, None, None, :]
        cx1 = caabb[..., 2][:, None, None, :]
        hit = ((cy0 <= (ty0g + (TILE_H - 1))[None, :, :, None])
               & (cy1 >= ty0g[None, :, :, None])
               & (cx0 <= (tx0g + (tile_w - 1))[None, :, :, None])
               & (cx1 >= tx0g[None, :, :, None]))  # [Bc, nty, ntx, nc]
        hit = hit.reshape(Bc, n_tiles, nc)
        counts = hit.sum(axis=-1).astype(jnp.int32)  # [Bc, n_tiles]
        remap = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32)

    kernel = _make_kernel(xs_, xo_, ys_, yo_, has_vp, nc, gpc, tile_w,
                          has_peel, use_remap, ntx, Bc > 1, emit_db=emit_db,
                          use_csr=use_csr, nty=nty_)

    def _b(b):
        return b if Bc > 1 else 0

    if use_csr:
        nk0 = n_tiles

        def chunk_of(b, ty, tx, c, cs_ref, cn_ref):
            t = ty * ntx + tx
            n0 = cn_ref[_b(b), t]
            n1 = cn_ref[_b(b), nk0 + ty]
            total = n0 + n1 + cn_ref[_b(b), nk0 + nty_]
            cc = jnp.minimum(c, jnp.maximum(total - 1, 0))
            return jnp.where(
                cc < n0, cs_ref[_b(b), t] + cc,
                jnp.where(cc < n0 + n1,
                          cs_ref[_b(b), nk0 + ty] + (cc - n0),
                          cs_ref[_b(b), nk0 + nty_] + (cc - n0 - n1)))

        in_specs = [
            pl.BlockSpec((1, 8, 2),
                         lambda b, ty, tx, c, s_, n_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        if has_vp:
            in_specs.append(pl.BlockSpec(
                (1, 8), lambda b, ty, tx, c, s_, n_: (0, 0),
                memory_space=pltpu.SMEM))
        in_specs += [
            pl.BlockSpec((1, 8, gpc),
                         lambda b, ty, tx, c, s_, n_: (
                             _b(b), chunk_of(b, ty, tx, c, s_, n_), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, gpc, 128),
                         lambda b, ty, tx, c, s_, n_: (
                             _b(b), chunk_of(b, ty, tx, c, s_, n_), 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [ranges] + ([y0_in] if has_vp else []) + [gaabb_k, rec_s]
        peel_im = lambda b, ty, tx, c, s_, n_: (b, ty, tx)
        out_im = lambda b, ty, tx, c, s_, n_: (b, ty, tx)
    elif use_remap:
        def chunk_of(b, ty, tx, c, remap_ref, cnt_ref):
            t = ty * ntx + tx
            cc = jnp.minimum(c, jnp.maximum(cnt_ref[_b(b), t] - 1, 0))
            return remap_ref[_b(b), t, cc]

        in_specs = [
            pl.BlockSpec((1, 8, 2),
                         lambda b, ty, tx, c, r_, n_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        if has_vp:
            in_specs.append(pl.BlockSpec(
                (1, 8), lambda b, ty, tx, c, r_, n_: (0, 0),
                memory_space=pltpu.SMEM))
        in_specs += [
            pl.BlockSpec((1, 8, gpc),
                         lambda b, ty, tx, c, r_, n_: (
                             _b(b), chunk_of(b, ty, tx, c, r_, n_), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, gpc, 128),
                         lambda b, ty, tx, c, r_, n_: (
                             _b(b), chunk_of(b, ty, tx, c, r_, n_), 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [ranges] + ([y0_in] if has_vp else []) + [gaabb_k, rec_s]
        peel_im = lambda b, ty, tx, c, r_, n_: (b, ty, tx)
        out_im = lambda b, ty, tx, c, r_, n_: (b, ty, tx)
    else:
        in_specs = [
            pl.BlockSpec((1, 8, 2), lambda b, ty, tx, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        if has_vp:
            in_specs.append(pl.BlockSpec(
                (1, 8), lambda b, ty, tx, c: (0, 0),
                memory_space=pltpu.SMEM))
        # Pad the chunk axis to a multiple of 8: SMEM blocks with a
        # size-1 (or non-multiple-of-8) middle dim mis-tile on some
        # Mosaic versions (same treatment as `ranges` above). The
        # kernel only indexes rows c < nc.
        ncp = _cdiv(nc, 8) * 8
        if ncp != nc:
            caabb = jnp.pad(caabb, ((0, 0), (0, ncp - nc), (0, 0)),
                            constant_values=_BIG)
        in_specs += [
            pl.BlockSpec((1, ncp, 4),
                         lambda b, ty, tx, c: (_b(b), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, gpc),
                         lambda b, ty, tx, c: (_b(b), c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, gpc, 128),
                         lambda b, ty, tx, c: (_b(b), c, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = ([ranges] + ([y0_in] if has_vp else [])
                  + [caabb, gaabb_k, rec_s])
        peel_im = lambda b, ty, tx, c: (b, ty, tx)
        out_im = lambda b, ty, tx, c: (b, ty, tx)

    if has_peel:
        peel_p = peel_depth
        if (Hp, Wp) != (H, W):
            peel_p = jnp.pad(peel_depth, ((0, 0), (0, Hp - H), (0, Wp - W)),
                             constant_values=jnp.inf)
        in_specs.append(pl.BlockSpec(
            (1, TILE_H, tile_w), peel_im, memory_space=pltpu.VMEM))
        inputs.append(peel_p)

    out_spec = pl.BlockSpec((1, TILE_H, tile_w), out_im,
                            memory_space=pltpu.VMEM)
    n_out = 9 if emit_db else 5
    out_shape = [jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)] * n_out

    grid = (B, nty, ntx, nc)
    scratch = [pltpu.VMEM((TILE_H, tile_w), jnp.float32)] * (
        3 if emit_db else 1)
    if use_remap or use_csr:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_spec] * n_out,
            scratch_shapes=scratch,
        )
        sp_args = (cstart, ccnt) if use_csr else (remap, counts)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*sp_args, *inputs)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[out_spec] * n_out,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)

    outs = [o[:, :H, :W] for o in outs]
    if not emit_db:
        u, v, zw, idf, zbuf = outs
        if flat:
            return u, v, zw, idf, zbuf
        out = jnp.stack([u, v, zw, idf], axis=-1)
        out_db = jnp.zeros(out.shape[:-1] + (4,), jnp.float32)
        return out, out_db, zbuf
    u, v, zw, idf, dudx, dudy, dvdx, dvdy, zbuf = outs
    if flat:
        return u, v, zw, idf, dudx, dudy, dvdx, dvdy, zbuf
    out = jnp.stack([u, v, zw, idf], axis=-1)
    out_db = jnp.stack([dudx, dudy, dvdx, dvdy], axis=-1)
    return out, out_db, zbuf
