"""Fused Pallas TPU sampler for 2D textures (all linear filter modes).

The XLA path (texture.py) pays ~9-25 ns per texel lookup in XLA's
gather lowering — at 2048² trilinear that is 8 corner gathers of 4M
rows plus per-pixel mip-metadata gathers, ~100-200 ms. This kernel
keeps the flat-packed mip pyramid resident in VMEM (channel-major) —
levels past the VMEM budget stay in HBM and are gathered through
windowed DMA (_gather_big) — and resolves all corners of all levels
in one pass:

* Per pixel block, for each *static* mip level, the kernel computes
  the 4 corner texel ids in-register and sweeps only the 128-lane
  id-chunk range actually touched by the block (spatially coherent
  uvs make this a handful of chunks). Levels are swept separately so
  the pyramid's per-level offset never inflates the range — this is
  what makes the lookup tractable where a mixed-level table_take was
  measured 4x slower than XLA (mip-mixed ids defeat range skipping).
* The lookup itself is the VPU lane-gather pattern of ops/gather.py:
  broadcast chunk row + take_along_axis + masked select.
* Forward emits the filtered color; the backward kernel re-gathers
  corners and emits analytic d(out)/d(u, v, flevel) contracted with
  the cotangent in VMEM. Texture gradients (a scatter) run outside on
  the MXU one-hot scatter with ids/weights recomputed elementwise —
  the corner setup is pure jnp and shared between kernel and host.
* custom_vjp boundary is (pyramid, u, v, flevel): everything outside
  (footprint -> flevel math, mip construction, uv wiring) stays on
  JAX AD, reproducing the reference's uv_da/bias/mip gradient pulls
  (texture_kernel.cu:905-1154) exactly as the XLA path does.

Reference: csrc/common/texture_kernel.cu:368-585, 709-838.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B knob (benchmarks): address the gradient scatter with (8, 128)-
# tiled apron ids (footprint-area id spans) vs row-major apron ids.
_TILED_IDS = os.environ.get("NVDR_TILED_IDS", "1") != "0"
# A/B knob: separable lattice scatter (ops/lattice_scatter.py) for the
# wrt-tex gradient (single-texture pyramids) vs the generic windowed
# one-hot scatter.
_SEP_SCATTER = os.environ.get("NVDR_SEP_SCATTER", "1") != "0"

LANE = 128
TILE_H = 64  # image-tile rows per kernel block (x128 columns)
_MAX_VMEM_TABLE = 1 << 21  # pyramid floats kept in VMEM (8 MB f32)
_MAX_CHANNELS = 8
_MIN_N = 1 << 16  # below this XLA gather overhead is acceptable
# Large-texture window: pyramid levels that don't fit the VMEM table
# stay in HBM laid out [C, B*h, w/128, 128]; per (_WIN_ROWS-row window
# x 128-lane column chunk) touched by a pixel block the kernel DMAs a
# _WIN_ROWS x 128 texel window into VMEM scratch and gathers locally.
# uvs are image-tile coherent, so a 64x128 pixel block touches a
# handful of windows per level.
_WIN_ROWS = 8
# Pixels per grid step of the texture-gradient MXU scatter. On-chip
# A/B at bench shapes (benchmarks/profile_scatter.py: 42.12 ms at 8192
# vs 42.45 at 4096) showed the id-span overdraw is not the scatter's
# bottleneck; the default chunk wins on per-step overhead.
_SCAT_P_CHUNK = 8192


def _cdiv(a, b):
    return -(-a // b)


def _tile_order(x, B, H, W, fill=None):
    """Row-major flat [..., B*H*W] -> tile-major flat [..., Np].

    Pixels are regrouped into TILE_H x 128 image tiles so each kernel
    block sees a compact screen region — the uv bounding box (hence the
    swept texel-id range) of a 2-D tile is tiny under any smooth
    mapping, where a full-width row strip spans most of the texture.
    Padding replicates edges (fill=None) or uses a constant.
    """
    Hp = _cdiv(H, TILE_H) * TILE_H
    Wp = _cdiv(W, LANE) * LANE
    lead = x.shape[:-1]
    img = x.reshape(lead + (B, H, W))
    pw = [(0, 0)] * len(lead) + [(0, 0), (0, Hp - H), (0, Wp - W)]
    if fill is None:
        img = jnp.pad(img, pw, mode="edge")
    else:
        img = jnp.pad(img, pw, constant_values=fill)
    img = img.reshape(lead + (B, Hp // TILE_H, TILE_H, Wp // LANE, LANE))
    img = jnp.swapaxes(img, -3, -2)  # [.., B, nty, ntx, TILE_H, LANE]
    return img.reshape(lead + (B * Hp * Wp,))


def _tile_unorder(x, B, H, W):
    """Inverse of _tile_order (drops padding)."""
    Hp = _cdiv(H, TILE_H) * TILE_H
    Wp = _cdiv(W, LANE) * LANE
    lead = x.shape[:-1]
    img = x.reshape(lead + (B, Hp // TILE_H, Wp // LANE, TILE_H, LANE))
    img = jnp.swapaxes(img, -3, -2)
    img = img.reshape(lead + (B, Hp, Wp))[..., :H, :W]
    return img.reshape(lead + (B * H * W,))


def supported(C, n_texels, N, cube_mode, boundary_mode, force=False,
              meta=None, L=0):
    """Can the fused path serve this config? `force` skips the
    profitability heuristic (explicit impl= request). 2D pyramids past
    the VMEM table budget are still served when every overflowing
    level is eligible for HBM window gathering (pass meta/L)."""
    if not cube_mode and boundary_mode not in ("wrap", "clamp", "zero"):
        return False
    if C > _MAX_CHANNELS or not (force or N >= _MIN_N):
        return False
    if C * _cdiv(n_texels, LANE) * LANE <= _MAX_VMEM_TABLE:
        return True
    if meta is None or L == 0:
        return False
    split = _split_levels(meta, L, C, n_texels)
    if C * _cdiv(n_texels - meta[split][0], LANE) * LANE > _MAX_VMEM_TABLE:
        return False  # even the 1-level tail overflows (huge minibatch)
    return all(_level_rows(meta, L, n_texels, lev) >= _WIN_ROWS
               for lev in range(split))


# ---------------------------------------------------------------------------
# Corner setup — pure jnp, shared by the kernels and the host-side
# gradient scatter. Mirrors texture.py:_linear_setup_2d /
# indexTextureLinear (texture_kernel.cu:368-472).
# ---------------------------------------------------------------------------

def _f32s(x):
    """Python number or traced int scalar -> f32 (dynamic-meta safe)."""
    if isinstance(x, (int, float)):
        return jnp.float32(x)
    return x.astype(jnp.float32)


def corner_setup(u, v, hi, wi, boundary_mode):
    """Bilinear corner addressing at one level.

    Args:
      u, v: raw uv arrays (any shape).
      hi, wi: level height/width — Python ints, or traced int32
        scalars when the kernel walks levels through the dynamic-meta
        fori loop (see _build_kernel).
      boundary_mode: 'wrap' | 'clamp' | 'zero'.

    Returns (iu0, iu1, iv0, iv1, fu, fv, w4, ok4) where the integer
    corner coordinates are clamped into range, w4 is a tuple of the 4
    bilinear weights in (00, 10, 01, 11) order with zero-boundary
    validity folded in, and ok4 are the validity masks as 0/1 floats
    (all ones for wrap/clamp).
    """
    w = _f32s(wi)
    h = _f32s(hi)
    if boundary_mode == "wrap":
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
    u = u * w - 0.5
    v = v * h - 0.5

    if boundary_mode == "clamp":
        u = jnp.clip(u, 0.0, w - 1.0)
        v = jnp.clip(v, 0.0, h - 1.0)
        clamp_u = (u == 0.0) | (u == w - 1.0)
        clamp_v = (v == 0.0) | (v == h - 1.0)

    iu0 = jnp.floor(u).astype(jnp.int32)
    iv0 = jnp.floor(v).astype(jnp.int32)
    if boundary_mode == "clamp":
        iu1 = iu0 + jnp.where(clamp_u, 0, 1)
        iv1 = iv0 + jnp.where(clamp_v, 0, 1)
    else:
        iu1 = iu0 + 1
        iv1 = iv0 + 1
    fu = u - iu0.astype(jnp.float32)
    fv = v - iv0.astype(jnp.float32)

    if boundary_mode == "wrap":
        iu0 = jnp.where(iu0 < 0, iu0 + wi, iu0)
        iv0 = jnp.where(iv0 < 0, iv0 + hi, iv0)
        iu1 = jnp.where(iu1 >= wi, iu1 - wi, iu1)
        iv1 = jnp.where(iv1 >= hi, iv1 - hi, iv1)

    one = jnp.ones(u.shape, jnp.float32)
    if boundary_mode == "zero":
        u0_ok = ((iu0 >= 0) & (iu0 < wi)).astype(jnp.float32)
        u1_ok = ((iu1 >= 0) & (iu1 < wi)).astype(jnp.float32)
        v0_ok = ((iv0 >= 0) & (iv0 < hi)).astype(jnp.float32)
        v1_ok = ((iv1 >= 0) & (iv1 < hi)).astype(jnp.float32)
        ok4 = (u0_ok * v0_ok, u1_ok * v0_ok, u0_ok * v1_ok, u1_ok * v1_ok)
    else:
        ok4 = (one, one, one, one)

    gu = 1.0 - fu
    gv = 1.0 - fv
    w4 = (gu * gv * ok4[0], fu * gv * ok4[1],
          gu * fv * ok4[2], fu * fv * ok4[3])
    iu0 = jnp.clip(iu0, 0, wi - 1)
    iu1 = jnp.clip(iu1, 0, wi - 1)
    iv0 = jnp.clip(iv0, 0, hi - 1)
    iv1 = jnp.clip(iv1, 0, hi - 1)
    return iu0, iu1, iv0, iv1, fu, fv, w4, ok4


def corner_ids(setup, base, wi):
    """Absolute flat texel ids for the 4 corners. `base` = level offset
    + tz * hi * wi (array or int)."""
    iu0, iu1, iv0, iv1 = setup[:4]
    return (base + iv0 * wi + iu0, base + iv0 * wi + iu1,
            base + iv1 * wi + iu0, base + iv1 * wi + iu1)


def level_weights(flevel, L, filter_mode):
    """Per-pixel (l0, l1, frac) with the trilinear/nearest-level rule."""
    if filter_mode == "linear":
        z = jnp.zeros(flevel.shape, jnp.int32)
        return z, z, jnp.zeros(flevel.shape, jnp.float32)
    l0 = jnp.clip(jnp.floor(flevel).astype(jnp.int32), 0, L - 1)
    if filter_mode == "linear-mipmap-nearest":
        return l0, l0, jnp.zeros(flevel.shape, jnp.float32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    frac = flevel - l0.astype(jnp.float32)
    return l0, l1, frac


# ---------------------------------------------------------------------------
# Extended-lattice texture gradient. The bilinear footprint of a pixel
# is a 2x2 lattice cell; instead of scattering each of the 4 corners
# (x 2 mip slots) in its own MXU one-hot pass, every contribution is
# addressed by its CELL id on an apron pyramid (each level padded by
# one texel on all sides, so the cell index jv+1, ju+1 is always in
# range with no wrap/clamp data dependence) and the 2 u-corners ride
# the value-row axis (K = 2C). One scatter call replaces 8; borders
# are folded back by static shift-adds. Weight math matches
# corner_setup exactly (texture_kernel.cu:368-472).
# ---------------------------------------------------------------------------

def lattice_setup(u, v, hi, wi, boundary_mode):
    """Unclamped bilinear cell (ju, jv) in [-1, n-1] plus w4.

    The corner (du, dv) of pixel cells lives at texel (ju+du, jv+dv)
    pre-wrap/clamp; w4 is identical to corner_setup's (validity folded
    in for 'zero'). hi/wi may be Python ints or per-pixel int32 arrays
    (gathered level dims — see _sample_bwd)."""
    w = _f32s(wi)
    h = _f32s(hi)
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
        ok4 = (u0_ok * v0_ok, u1_ok * v0_ok, u0_ok * v1_ok, u1_ok * v1_ok)
        # Arbitrary out-of-texture uvs: park the (weightless) cell on
        # the apron so its id stays in range.
        ju = jnp.clip(ju, -1, wi - 1)
        jv = jnp.clip(jv, -1, hi - 1)
    else:
        ok4 = (one, one, one, one)
    gu = 1.0 - fu
    gv = 1.0 - fv
    w4 = (gu * gv * ok4[0], fu * gv * ok4[1],
          gu * fv * ok4[2], fu * fv * ok4[3])
    return ju, jv, w4


def ext_meta(meta, L, NT):
    """Apron-pyramid layout: ((eoff, hl, wl) per level, NTe, B_tex)."""
    texels = sum(h * w for _, h, w in meta[:L])
    B_tex = NT // texels
    out = []
    eoff = 0
    for lev in range(L):
        _, hl, wl = meta[lev]
        out.append((eoff, hl, wl))
        eoff += B_tex * (hl + 2) * (wl + 2)
    return tuple(out), eoff, B_tex


def ext_meta_tiled(meta, L, NT):
    """(8, 128)-tiled apron-pyramid layout for the gradient scatter.

    Row-major apron ids give an image tile's contributions an id SPAN
    of ~(bbox rows) * (level width): the windowed MXU scatter then
    sweeps every 128-id window under the bbox rows — measured as the
    dominant texture-backward cost (most windows in the span are
    live-tested or hit). Tiling the apron grid into (8, 128) texel
    tiles (the TPU-native layout) makes a bbox's ids span ~its AREA:
    ~4x fewer windows for a 17x130-texel footprint.

    Returns ((eoff_t, hl, wl, hep, wep) per level, NTe_tiled, B_tex)
    where hep/wep are the apron dims padded to (8, 128) multiples.
    """
    texels = sum(h * w for _, h, w in meta[:L])
    B_tex = NT // texels
    out = []
    eoff = 0
    for lev in range(L):
        _, hl, wl = meta[lev]
        hep = _cdiv(hl + 2, 8) * 8
        wep = _cdiv(wl + 2, LANE) * LANE
        out.append((eoff, hl, wl, hep, wep))
        eoff += B_tex * hep * wep
    return tuple(out), eoff, B_tex


def tiled_apron_id(eoff_t, hep, wep, tz, r, c):
    """Flat id of apron texel (r, c) in the (8, 128)-tiled level grid.

    r/c may be any int32 arrays in [0, hep) x [0, wep); tiles are laid
    row-major, texels row-major inside each (8, 128) tile."""
    return (eoff_t + tz * (hep * wep)
            + (r >> 3) * (wep * 8) + (c >> 7) * 1024
            + (r & 7) * LANE + (c & 127))


def untile_ext_grad(g_ext_t, emeta_t, L, B_tex):
    """[K, NTe_tiled] tiled apron sums -> [K, NTe] row-major apron
    layout (the fold_ext_grad input)."""
    K = g_ext_t.shape[0]
    parts = []
    for lev in range(L):
        eoff, hl, wl, hep, wep = emeta_t[lev]
        n = B_tex * hep * wep
        E = g_ext_t[:, eoff:eoff + n].reshape(
            K, B_tex, hep // 8, wep // LANE, 8, LANE)
        E = jnp.transpose(E, (0, 1, 2, 4, 3, 5)).reshape(
            K, B_tex, hep, wep)
        parts.append(E[:, :, :hl + 2, :wl + 2].reshape(K, -1))
    return jnp.concatenate(parts, axis=-1)


def _fold_last(T, n, mode, shift):
    """Fold a (n+2)-wide extended last axis onto n real texels.

    Entry at extended index e holds the contribution of texel
    a = e - shift (shift = 1 for the du=0 corner, 0 for du=1); borders
    wrap / clamp / drop per boundary mode."""
    core = T[..., shift:n + shift]
    if mode == "zero":
        return core
    lo = T[..., :shift]            # a = -1
    hi = T[..., n + shift:]        # a = n (+1 zero slab when shift=0)
    if mode == "wrap":
        if shift:
            core = core.at[..., (n - 1) % n].add(lo[..., 0])
        for i in range(hi.shape[-1]):
            core = core.at[..., i % n].add(hi[..., i])
    else:  # clamp
        if shift:
            core = core.at[..., 0].add(lo[..., 0])
        for i in range(hi.shape[-1]):
            core = core.at[..., n - 1].add(hi[..., i])
    return core


def fold_ext_grad(g_ext, meta, L, B_tex, boundary_mode, C):
    """[2C, NTe] apron-lattice sums -> [C, NT] pyramid gradient."""
    parts = []
    eoff = 0
    for lev in range(L):
        _, hl, wl = meta[lev]
        he, we = hl + 2, wl + 2
        n = B_tex * he * we
        E = g_ext[:, eoff:eoff + n].reshape(2, C, B_tex, he, we)
        eoff += n
        acc = None
        for du in (0, 1):
            t = _fold_last(E[du], wl, boundary_mode, 1 - du)
            t = jnp.swapaxes(
                _fold_last(jnp.swapaxes(t, -1, -2), hl, boundary_mode, 1),
                -1, -2)
            acc = t if acc is None else acc + t
        parts.append(acc.reshape(C, B_tex * hl * wl))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Kernel builder.
# ---------------------------------------------------------------------------

def _flatpad(x, rows_p):
    n = x.shape[-1]
    npad = rows_p * LANE - n
    if npad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (npad,))],
            axis=-1)
    return x.reshape(x.shape[:-1] + (rows_p, LANE))


def _prep_table(tbl_cm):
    K, R = tbl_cm.shape
    Rp = _cdiv(R, LANE) * LANE
    if Rp != R:
        tbl_cm = jnp.pad(tbl_cm, ((0, 0), (0, Rp - R)))
    return tbl_cm.reshape(K, Rp // LANE, LANE)


def _gather_corners(tbl_ref, setup, base_s, wl, active, C, q_ref):
    """2-D texture corner gather (see _gather_rc)."""
    iu0, iu1, iv0, iv1 = setup[:4]
    _gather_rc(tbl_ref, (iv0, iv0, iv1, iv1), (iu0, iu1, iu0, iu1),
               base_s, wl, active, C, q_ref)


def _gather_rc(tbl_ref, rows4, cols4, base_s, wl, active, C, q_ref):
    """q_ref[4c + corner] <- tbl[c, base_s + row*wl + col] per corner.

    Bounded 2-D sweep: iterates the texel ROWS of the block's bounding
    box, and within each row only the 128-lane chunks its column range
    touches — so cost scales with the bbox area, not with the texture
    width (a flat id sweep would walk every chunk of every bbox row).
    `base_s` is a block-constant flat offset (level offset; tz / face
    terms ride in `rows4`). Rows may span disjoint clusters (background
    uv wrap, cube faces): the two extreme row values are visited
    explicitly and only the strictly-interior interval is swept.
    """
    ids4 = tuple(base_s + r * wl + c for r, c in zip(rows4, cols4))
    his = [i >> 7 for i in ids4]
    los = [i & 127 for i in ids4]
    shape = cols4[0].shape
    big = jnp.int32(1 << 30)

    def mmin4(vals):
        m = jnp.minimum(jnp.minimum(vals[0], vals[1]),
                        jnp.minimum(vals[2], vals[3]))
        return jnp.min(jnp.where(active, m, big))

    def mmax4(vals):
        m = jnp.maximum(jnp.maximum(vals[0], vals[1]),
                        jnp.maximum(vals[2], vals[3]))
        return jnp.max(jnp.where(active, m, -1))

    umin = mmin4(cols4)
    umax = mmax4(cols4)
    rmin = mmin4(rows4)
    rmax = mmax4(rows4)

    # Row clusters: blocks routinely mix a few exact far-apart row
    # values with a compact interval — e.g. background pixels at
    # uv = (0, 0) in wrap mode touch texel rows {0, wl-1}, cube-map
    # corners wrap onto other faces — while the surface pixels occupy
    # a narrow band. Visiting the two extreme rows explicitly and
    # sweeping only the strictly-interior interval keeps the loop
    # linear in *occupied* rows, not the bbox height.
    any_act = rmax >= 0
    r_first = jnp.where(any_act, rmin, 0)
    r_last = jnp.where(any_act, rmax, 0)
    lo2 = []
    hi2 = []
    for rr in rows4:
        inr = active & (rr > r_first) & (rr < r_last)
        lo2.append(jnp.where(inr, rr, big))
        hi2.append(jnp.where(inr, rr, -1))
    rmin2 = jnp.min(jnp.minimum(jnp.minimum(lo2[0], lo2[1]),
                                jnp.minimum(lo2[2], lo2[3])))
    rmax2 = jnp.max(jnp.maximum(jnp.maximum(hi2[0], hi2[1]),
                                jnp.maximum(hi2[2], hi2[3])))

    for k in range(4 * C):
        q_ref[k] = jnp.zeros(shape, jnp.float32)

    def rbody(r, carry):
        rowstart = base_s + r * wl

        def cbody(h, carry2):
            sels = [active & (his[corner] == h) for corner in range(4)]
            # Blocks mixing pixel clusters (e.g. background uv=0 next
            # to surface uvs, or wrap-seam straddles) have bounding
            # boxes far larger than their occupied (row, chunk) set —
            # skip the gather body on empty steps.
            hit = (sels[0] | sels[1]) | (sels[2] | sels[3])

            @pl.when(jnp.any(hit))
            def _do():
                for c in range(C):
                    row = tbl_ref[c, h, :]
                    chunk = jnp.broadcast_to(row[None, :], shape)
                    for corner in range(4):
                        g = jnp.take_along_axis(chunk, los[corner], axis=1)
                        k = 4 * c + corner
                        q_ref[k] = jnp.where(sels[corner], g, q_ref[k])

            return carry2

        jax.lax.fori_loop((rowstart + umin) >> 7,
                          ((rowstart + umax) >> 7) + 1, cbody, 0)
        return carry

    rbody(r_first, 0)

    @pl.when(r_last != r_first)
    def _last_row():
        rbody(r_last, 0)

    jax.lax.fori_loop(rmin2, rmax2 + 1, rbody, 0)


def _split_levels(meta, L, C, NT):
    """First VMEM-resident level: levels [0, split) stay in HBM and are
    sampled through windowed DMA; the [split, L) tail is packed into
    the VMEM table. split is the smallest index whose tail fits."""
    split = 0
    while (split < L - 1
           and C * _cdiv(NT - meta[split][0], LANE) * LANE
           > _MAX_VMEM_TABLE):
        split += 1
    return split


def _level_rows(meta, L, NT, lev):
    """(B_tex * h) texture rows of level `lev` (minibatch included)."""
    off, hl, wl = meta[lev]
    nxt = meta[lev + 1][0] if lev + 1 < L else NT
    return (nxt - off) // wl


def _gather_big_2d(bref, setup, tzs, hl, wl, wlp, active, C, q_ref,
                   wscr_ref, sem):
    """2-D texture corner gather from an HBM level (see _gather_big)."""
    iu0, iu1, iv0, iv1 = setup[:4]
    _gather_big(bref, tuple(r + tzs * hl for r in (iv0, iv0, iv1, iv1)),
                (iu0, iu1, iu0, iu1), wlp, active, C, q_ref, wscr_ref,
                sem)


def _gather_big(bref, rows4, cols4, wlp, active, C, q_ref, wscr_ref, sem):
    """Corner gather from an HBM-resident level [C, R, wlp/128, 128].

    Large levels don't fit the VMEM table; instead, for each
    (_WIN_ROWS-row window x 128-lane column chunk) of the level that
    the block's corners touch, one DMA stages the window into VMEM
    scratch and the usual lane-gather runs on it. uvs are image-tile
    coherent, so a 64x128 pixel block touches a handful of windows —
    traffic ~= the block's texel footprint. `rows4` are global row
    coordinates (minibatch / cube-face terms folded in by the caller);
    `cols4` are in [0, wl). BOTH axes use _gather_rc's extreme-cluster
    split (background uv=(0,0) in wrap mode poisons the row AND column
    intervals; revisits are safe: corner selects are idempotent) plus
    any-hit guards per step. The reference leans on hardware texture
    caches for the same locality (csrc/common/texture_kernel.cu:368-472).
    """
    chs4 = tuple(cc >> 7 for cc in cols4)
    los = tuple(cc & 127 for cc in cols4)
    WR = _WIN_ROWS
    BH = bref.shape[1]
    big = jnp.int32(1 << 30)
    shape = cols4[0].shape

    def mmin4(vals, act):
        m = jnp.minimum(jnp.minimum(vals[0], vals[1]),
                        jnp.minimum(vals[2], vals[3]))
        return jnp.min(jnp.where(act, m, big))

    def mmax4(vals, act):
        m = jnp.maximum(jnp.maximum(vals[0], vals[1]),
                        jnp.maximum(vals[2], vals[3]))
        return jnp.max(jnp.where(act, m, -1))

    def interior(vals4, vlo, vhi):
        # Window indices of values strictly inside (vlo, vhi).
        lo2 = []
        hi2 = []
        for vv, win in vals4:
            inr = active & (vv > vlo) & (vv < vhi)
            lo2.append(jnp.where(inr, win, big))
            hi2.append(jnp.where(inr, win, -1))
        return (jnp.min(jnp.minimum(jnp.minimum(lo2[0], lo2[1]),
                                    jnp.minimum(lo2[2], lo2[3]))),
                jnp.max(jnp.maximum(jnp.maximum(hi2[0], hi2[1]),
                                    jnp.maximum(hi2[2], hi2[3]))))

    rmin = mmin4(rows4, active)
    rmax = mmax4(rows4, active)
    cmin = mmin4(cols4, active)
    cmax = mmax4(cols4, active)
    any_act = rmax >= 0
    w_first = jnp.where(any_act, rmin // WR, 0)
    w_last = jnp.where(any_act, rmax // WR, 0)
    wmin2, wmax2 = interior([(r, r // WR) for r in rows4], rmin, rmax)
    ch_first = jnp.where(any_act, cmin >> 7, 0)
    ch_last = jnp.where(any_act, cmax >> 7, 0)
    chmin2, chmax2 = interior([(c, c >> 7) for c in cols4], cmin, cmax)

    def wbody(rw, carry):
        # Clamped start keeps the static-size window in range even
        # when B*h is not a multiple of the window (duplicate visits
        # are harmless).
        rw0 = jnp.minimum(rw * WR, BH - WR)
        row_in = [active & (r >= rw0) & (r < rw0 + WR) for r in rows4]

        def dma(ch, slot):
            return pltpu.make_async_copy(
                bref.at[:, pl.ds(rw0, WR), ch, :], wscr_ref.at[slot],
                sem.at[slot])

        def gather(ch, slot, sels):
            def rbody(rloc, carry3):
                s2 = [sels[k] & (rows4[k] - rw0 == rloc)
                      for k in range(4)]
                h2 = (s2[0] | s2[1]) | (s2[2] | s2[3])

                @pl.when(jnp.any(h2))
                def _g():
                    for c in range(C):
                        row = wscr_ref[slot, c, rloc, :]
                        chunk = jnp.broadcast_to(row[None, :], shape)
                        for k in range(4):
                            g = jnp.take_along_axis(chunk, los[k],
                                                    axis=1)
                            kk = 4 * c + k
                            q_ref[kk] = jnp.where(s2[k], g, q_ref[kk])

                return carry3

            jax.lax.fori_loop(0, WR, rbody, 0)

        def cbody_serial(ch, carry2):
            sels = [row_in[k] & (chs4[k] == ch) for k in range(4)]
            hit = (sels[0] | sels[1]) | (sels[2] | sels[3])

            @pl.when(jnp.any(hit))
            def _do():
                cp = dma(ch, 0)
                cp.start()
                cp.wait()
                gather(ch, 0, sels)

            return carry2

        # Extreme column chunks: serial (they wait before the
        # pipelined interior issues anything on slot 0).
        cbody_serial(ch_first, 0)

        @pl.when(ch_last != ch_first)
        def _last_ch():
            cbody_serial(ch_last, 0)

        # Interior interval: double-buffered — the DMA for chunk ch+1
        # is in flight while ch's texels are gathered. Interior chunks
        # are fetched unconditionally (the surface's occupied span is
        # dense once the extremes are split out; a wasted 12 KB fetch
        # costs far less than a serial DMA stall per chunk).
        @pl.when(chmin2 <= chmax2)
        def _interior():
            dma(chmin2, chmin2 & 1).start()

            def cbody(ch, carry2):
                slot = ch & 1

                @pl.when(ch < chmax2)
                def _prefetch():
                    dma(ch + 1, (ch + 1) & 1).start()

                dma(ch, slot).wait()
                sels = [row_in[k] & (chs4[k] == ch) for k in range(4)]
                hit = (sels[0] | sels[1]) | (sels[2] | sels[3])

                @pl.when(jnp.any(hit))
                def _do():
                    gather(ch, slot, sels)

                return carry2

            jax.lax.fori_loop(chmin2, chmax2 + 1, cbody, 0)

        return carry

    for k in range(4 * C):
        q_ref[k] = jnp.zeros(shape, jnp.float32)

    wbody(w_first, 0)

    @pl.when(w_last != w_first)
    def _last_win():
        wbody(w_last, 0)

    jax.lax.fori_loop(wmin2, wmax2 + 1, wbody, 0)


# Walk the VMEM-resident mip tail with ONE fori_loop over SMEM level
# metadata instead of unrolling per level: Mosaic compile time scaled
# with the unroll (L=5: ~7 s, L=10-11: 240-296 s on chip — at the
# compiler's limits, see benchmarks/results_r4.md), while the loop
# body is level-agnostic (all per-level constants are 4 int32
# scalars). HBM windowed-DMA levels keep their static unroll (each
# binds a different ref; there are only 1-2).
_DYN_LEVEL_LOOP = True


def _build_kernel(mode, C, L, meta_k, boundary_mode, filter_mode, n_big=0,
                  dyn_levels=False):
    """mode: 'fwd' emits [C] filtered color; 'bwd' emits (gu, gv, gfl).

    meta_k: per level either ('vmem', off_rel, h, w) — packed into the
    VMEM-resident tail table — or ('hbm', big_idx, h, w, wlp) — an
    HBM-resident level gathered through windowed DMA (_gather_big).
    The per-pixel minibatch texture index tz arrives as an input array
    so the kernel is minibatch-agnostic. With dyn_levels the VMEM tail
    is walked by a fori_loop reading (off_rel, h, w, h*w) rows from an
    SMEM meta array (the kernel's first operand) instead of a static
    unroll.
    """
    split = n_big  # meta_k[:n_big] are the HBM levels, tail is VMEM

    def kernel(*refs):
        if dyn_levels:
            meta_ref, *refs = refs
        tbl_ref = refs[0]
        big_refs = refs[1:1 + n_big]
        rest = refs[1 + n_big:]
        if mode == "fwd":
            (u_ref, v_ref, fl_ref, tz_ref, out_ref, *scr) = rest
        elif mode == "fwd_stash":
            (u_ref, v_ref, fl_ref, tz_ref, out_ref, qs_ref, *scr) = rest
        else:
            (u_ref, v_ref, fl_ref, tz_ref, dy_ref,
             gu_ref, gv_ref, gfl_ref, *scr) = rest
        if n_big:
            q_ref, wscr_ref, sem = scr
        else:
            (q_ref,) = scr
        n_slots = 2 if filter_mode == "linear-mipmap-linear" else 1

        u = u_ref[...]
        v = v_ref[...]
        fl = fl_ref[...]
        tz = tz_ref[...]
        l0, l1, frac = level_weights(fl, L, filter_mode)
        # Block-level active range: a 64x128 image tile's footprints
        # span 2-4 mip levels; walking only [lmin, lmax] (and guarding
        # each level on block activity) skips the corner setup + sweep
        # bound math of every other level entirely.
        lmin = jnp.min(l0)
        lmax = jnp.max(l1)

        if mode in ("fwd", "fwd_stash"):
            for c in range(C):
                out_ref[c] = jnp.zeros(u.shape, jnp.float32)
            if mode == "fwd_stash":
                for k in range(3 * C * n_slots):
                    qs_ref[k] = jnp.zeros(u.shape, jnp.float32)
        else:
            dy = [dy_ref[c] for c in range(C)]
            gu_ref[...] = jnp.zeros(u.shape, jnp.float32)
            gv_ref[...] = jnp.zeros(u.shape, jnp.float32)
            gfl_ref[...] = jnp.zeros(u.shape, jnp.float32)

        def level_term(lev, hbm_ent, off, hl, wl, hw):
            """One mip level's filtered contribution. lev/off/hl/wl/hw
            are Python ints (static unroll) or traced int32 scalars
            (dynamic-meta loop); hbm_ent selects the windowed-DMA
            gather for HBM-resident levels."""
            on0 = l0 == lev
            on1 = l1 == lev
            active = on0 | on1

            # Inactive levels contribute exact zeros — skipping the
            # whole body preserves bit parity.
            @pl.when(jnp.any(active))
            def _level_body():
                # Per-level blend weight: (1-frac) on l0 plus frac on
                # l1; both when l0 == l1 (sum = 1).
                wgt = (jnp.where(on0, 1.0 - frac, 0.0)
                       + jnp.where(on1, frac, 0.0))

                setup = corner_setup(u, v, hl, wl, boundary_mode)
                # tz is block-constant (blocks never straddle images).
                if hbm_ent is not None:
                    _gather_big_2d(big_refs[hbm_ent[1]], setup, tz[0, 0],
                                   hl, wl, hbm_ent[4], active, C, q_ref,
                                   wscr_ref, sem)
                else:
                    base_s = off + tz[0, 0] * hw
                    _gather_corners(tbl_ref, setup, base_s, wl, active, C,
                                    q_ref)
                fu, fv, w4, ok4 = setup[4], setup[5], setup[6], setup[7]

                if mode in ("fwd", "fwd_stash"):
                    zero_bm = boundary_mode == "zero"
                    for c in range(C):
                        val = (w4[0] * q_ref[4 * c + 0]
                               + w4[1] * q_ref[4 * c + 1]
                               + w4[2] * q_ref[4 * c + 2]
                               + w4[3] * q_ref[4 * c + 3])
                        out_ref[c] = out_ref[c] + jnp.where(
                            active, wgt * val, 0.0)
                        if mode != "fwd_stash":
                            continue
                        # Stash the backward's per-slot ingredients
                        # (exactly the bwd branch's dqu/dqv/val math)
                        # so the wrt-uv backward needs no re-gather:
                        # rows [slot*3C + {c, C+c, 2C+c}] =
                        # (dqu, dqv, val) of channel c.
                        q00 = q_ref[4 * c + 0]
                        q10 = q_ref[4 * c + 1]
                        q01 = q_ref[4 * c + 2]
                        q11 = q_ref[4 * c + 3]
                        if zero_bm:
                            q00 = q00 * ok4[0]
                            q10 = q10 * ok4[1]
                            q01 = q01 * ok4[2]
                            q11 = q11 * ok4[3]
                        dqu = (1.0 - fv) * (q10 - q00) + fv * (q11 - q01)
                        dqv = (1.0 - fu) * (q01 - q00) + fu * (q11 - q10)
                        slot_on = (on0, on1)[:n_slots]
                        for s, on in enumerate(slot_on):
                            b = 3 * C * s
                            qs_ref[b + c] = jnp.where(
                                on & active, dqu, qs_ref[b + c])
                            qs_ref[b + C + c] = jnp.where(
                                on & active, dqv, qs_ref[b + C + c])
                            qs_ref[b + 2 * C + c] = jnp.where(
                                on & active, val, qs_ref[b + 2 * C + c])
                else:
                    zero_bm = boundary_mode == "zero"
                    gu = jnp.zeros(u.shape, jnp.float32)
                    gv = jnp.zeros(u.shape, jnp.float32)
                    gl = jnp.zeros(u.shape, jnp.float32)
                    for c in range(C):
                        q00 = q_ref[4 * c + 0]
                        q10 = q_ref[4 * c + 1]
                        q01 = q_ref[4 * c + 2]
                        q11 = q_ref[4 * c + 3]
                        if zero_bm:
                            # Invalid corners contribute 0 to the value
                            # and to its uv derivative (w4 carries
                            # validity but the derivative combos need
                            # masked values).
                            q00 = q00 * ok4[0]
                            q10 = q10 * ok4[1]
                            q01 = q01 * ok4[2]
                            q11 = q11 * ok4[3]
                        # d(bilerp)/d(fu), d/d(fv):
                        dqu = (1.0 - fv) * (q10 - q00) + fv * (q11 - q01)
                        dqv = (1.0 - fu) * (q01 - q00) + fu * (q11 - q10)
                        val = (w4[0] * q_ref[4 * c + 0]
                               + w4[1] * q_ref[4 * c + 1]
                               + w4[2] * q_ref[4 * c + 2]
                               + w4[3] * q_ref[4 * c + 3])
                        gu = gu + dy[c] * dqu
                        gv = gv + dy[c] * dqv
                        gl = gl + dy[c] * val
                    # fu = u * wl - 0.5 (wrap/zero) -> d fu/du = wl;
                    # clamp edges zero the derivative through
                    # q10 == q00 instead.
                    gu_ref[...] = gu_ref[...] + jnp.where(
                        active, wgt * gu * _f32s(wl), 0.0)
                    gv_ref[...] = gv_ref[...] + jnp.where(
                        active, wgt * gv * _f32s(hl), 0.0)
                    # d out/d flevel = val(l1) - val(l0).
                    dwdf = (jnp.where(on1, 1.0, 0.0)
                            - jnp.where(on0, 1.0, 0.0))
                    gfl_ref[...] = gfl_ref[...] + jnp.where(
                        active, dwdf * gl, 0.0)

        for lev in range(split):  # HBM levels: static (distinct refs)
            ent = meta_k[lev]
            level_term(lev, ent, None, ent[2], ent[3], None)

        if dyn_levels and L > split:
            def lbody(lev, carry):
                level_term(lev, None, meta_ref[lev, 0], meta_ref[lev, 1],
                           meta_ref[lev, 2], meta_ref[lev, 3])
                return carry

            jax.lax.fori_loop(jnp.maximum(lmin, split),
                              jnp.minimum(lmax, L - 1) + 1, lbody, 0)
        else:
            for lev in range(split, L):
                ent = meta_k[lev]
                level_term(lev, None, ent[1], ent[2], ent[3],
                           ent[2] * ent[3])

    return kernel


def _call_sampler(mode, flat_cm, u, v, flevel, tz, dy_cm, meta, L, C,
                  boundary_mode, filter_mode, interpret=False):
    """All per-pixel arrays arrive tile-major (see _tile_order), with
    length a multiple of TILE_H * LANE: one kernel block = one tile."""
    N = u.shape[0]
    BLKR = TILE_H
    rows_p = N // LANE
    assert rows_p % BLKR == 0

    # Split the pyramid: levels whose cumulative tail exceeds the VMEM
    # table budget live in HBM as [C, B*h, wlp/128, 128] arrays and are
    # gathered through windowed DMA.
    NT = flat_cm.shape[1]
    split = _split_levels(meta, L, C, NT)
    bigs = []
    meta_k = []
    for lev in range(L):
        off, hl, wl = meta[lev]
        if lev < split:
            nxt = meta[lev + 1][0] if lev + 1 < L else NT
            bh = (nxt - off) // wl
            wlp = _cdiv(wl, LANE) * LANE
            blk = flat_cm[:, off:nxt].reshape(C, bh, wl)
            if wlp != wl:
                blk = jnp.pad(blk, ((0, 0), (0, 0), (0, wlp - wl)))
            bigs.append(blk.reshape(C, bh, wlp // LANE, LANE))
            meta_k.append(("hbm", len(bigs) - 1, hl, wl, wlp))
        else:
            meta_k.append(("vmem", off - meta[split][0], hl, wl))

    tbl3 = _prep_table(flat_cm[:, meta[split][0]:])
    HI = tbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in (u, v, flevel)]
    args.append(_flatpad(tz, rows_p))
    if mode == "bwd":
        args.append(_flatpad(dy_cm, rows_p))

    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((C, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((C, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    big_spec = pl.BlockSpec(memory_space=pl.ANY)

    dyn_levels = _DYN_LEVEL_LOOP and L > len(bigs)
    meta_in = []
    in_specs = []
    if dyn_levels:
        # (off_rel, h, w, h*w) per level for the kernel's fori walk of
        # the VMEM tail (HBM-level rows are present but unused).
        meta_in = [jnp.asarray(
            [[ent[1] if ent[0] == "vmem" else 0, ent[2], ent[3],
              ent[2] * ent[3]] for ent in meta_k], dtype=jnp.int32)]
        in_specs.append(pl.BlockSpec((L, 4), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    in_specs += [tbl_spec] + [big_spec] * len(bigs) + [flat_spec] * 4
    if mode == "bwd":
        in_specs.append(chan_spec)
        out_specs = [flat_spec] * 3
        out_shape = [jax.ShapeDtypeStruct((rows_p, LANE), jnp.float32)] * 3
    elif mode == "fwd_stash":
        n_slots = 2 if filter_mode == "linear-mipmap-linear" else 1
        SK = 3 * C * n_slots
        qs_spec = pl.BlockSpec((SK, BLKR, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
        out_specs = [chan_spec, qs_spec]
        out_shape = [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32),
                     jax.ShapeDtypeStruct((SK, rows_p, LANE), jnp.float32)]
    else:
        out_specs = [chan_spec]
        out_shape = [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32)]

    scratch = [pltpu.VMEM((4 * C, BLKR, LANE), jnp.float32)]
    if bigs:
        # 2-slot window scratch + semaphores: _gather_big
        # double-buffers the interior column sweep.
        scratch += [pltpu.VMEM((2, C, _WIN_ROWS, LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]

    kernel = _build_kernel(mode, C, L, tuple(meta_k), boundary_mode,
                           filter_mode, n_big=len(bigs),
                           dyn_levels=dyn_levels)
    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // BLKR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*meta_in, tbl3, *bigs, *args)

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    if mode == "fwd":
        return unflat(outs[0])
    return tuple(unflat(o) for o in outs)


# ---------------------------------------------------------------------------
# custom_vjp wrapper: (pyramid, u, v, flevel) -> [C, N].
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def sample_fused(flat_cm, u, v, flevel, tz, meta, L, boundary_mode,
                 filter_mode, shape, interpret):
    """Filtered texture sample. flat_cm: [C, NT] channel-major packed
    pyramid; u, v, flevel, tz: flat [N] row-major; meta: ((off, h, w),
    ...) per level (static); shape: static (B, H, W). Returns [C, N]."""
    C = flat_cm.shape[0]
    B, H, W = shape
    ut, vt, flt, tzt = (_tile_order(a, B, H, W)
                        for a in (u, v, flevel, tz))
    out = _call_sampler("fwd", flat_cm, ut, vt, flt, tzt, None, meta, L,
                        C, boundary_mode, filter_mode,
                        interpret=interpret)
    return _tile_unorder(out, B, H, W)


def _sample_fwd(flat_cm, u, v, flevel, tz, meta, L, boundary_mode,
                filter_mode, shape, interpret):
    # Differentiated forward: the fwd_stash kernel additionally emits
    # the backward's per-slot (dqu, dqv, val) rows (see _build_kernel)
    # so _sample_bwd's uv/level gradients are pure elementwise math —
    # no second corner-gather sweep. ~3C*slots*N floats of residual
    # traffic replaces the full bwd kernel (the re-gather sweep was
    # ~26 ms at 2048^2; the stash is ~1 ms of HBM). The undifferentiated
    # primal (inference) still runs the plain 'fwd' kernel.
    C = flat_cm.shape[0]
    B, H, W = shape
    ut, vt, flt, tzt = (_tile_order(a, B, H, W)
                        for a in (u, v, flevel, tz))
    out, stash = _call_sampler("fwd_stash", flat_cm, ut, vt, flt, tzt,
                               None, meta, L, C, boundary_mode,
                               filter_mode, interpret=interpret)
    # Residuals stay TILE-MAJOR (the bwd scatter wants that order).
    return (_tile_unorder(out, B, H, W),
            (flat_cm, ut, vt, flt, tzt, stash))


def _sample_bwd(meta, L, boundary_mode, filter_mode, shape, interpret,
                saved, dy):
    from .scatter import scatter_add_by_id

    flat_cm, ut, vt, flt, tzt, stash = saved
    C, NT = flat_cm.shape
    B, H, W = shape

    # Residuals are tile-major already; only dy needs reordering.
    # Padding pixels carry dy = 0 so their (edge-replicated uv) ids
    # scatter nothing and their stash rows contribute nothing.
    dyt = _tile_order(dy, B, H, W, fill=0.0)
    l0, l1, frac = level_weights(flt, L, filter_mode)

    # uv/level gradients from the stashed per-slot (dqu, dqv, val)
    # rows — same per-level math as the old bwd kernel
    # (d bilerp/d fu scaled by wl, level blend weight, dwdf), but pure
    # elementwise over the residual streams. Real level dims here
    # (not the apron's).
    rl_h = jnp.asarray([m[1] for m in meta], jnp.int32)
    rl_w = jnp.asarray([m[2] for m in meta], jnp.int32)
    n_slots = 2 if filter_mode == "linear-mipmap-linear" else 1
    if n_slots == 2:
        uv_slots = ((l0, 1.0 - frac, -1.0), (l1, frac, 1.0))
    else:
        uv_slots = ((l0, jnp.ones_like(frac), 0.0),)
    gu = jnp.zeros_like(flt)
    gv = jnp.zeros_like(flt)
    gfl = jnp.zeros_like(flt)
    for s, (lsel, lwgt, dsign) in enumerate(uv_slots):
        b = 3 * C * s
        du = sum(dyt[c] * stash[b + c] for c in range(C))
        dv = sum(dyt[c] * stash[b + C + c] for c in range(C))
        dval = sum(dyt[c] * stash[b + 2 * C + c] for c in range(C))
        wl_f = jnp.take(rl_w, lsel).astype(jnp.float32)
        hl_f = jnp.take(rl_h, lsel).astype(jnp.float32)
        gu = gu + lwgt * du * wl_f
        gv = gv + lwgt * dv * hl_f
        if dsign:
            gfl = gfl + dsign * dval
    gu = _tile_unorder(gu, B, H, W)
    gv = _tile_unorder(gv, B, H, W)
    gfl = _tile_unorder(gfl, B, H, W)

    # Texture gradient on the apron lattice: ONE MXU one-hot scatter
    # for all corners of all mip slots (cell ids + 2C value rows; the
    # two cell rows ride concatenated pixel streams), then fold the
    # apron borders back per boundary mode. Cell ids address the
    # (8, 128)-TILED apron pyramid so an image tile's id span tracks
    # its footprint AREA, not rows x level width (see ext_meta_tiled);
    # the tiled sums are untiled back to the row-major apron layout
    # before the boundary fold.
    emeta, NTe, B_tex = ext_meta(meta, L, NT)
    emeta_t, NTe_t, _ = ext_meta_tiled(meta, L, NT)
    if filter_mode == "linear-mipmap-linear":
        slots = ((l0, 1.0 - frac), (l1, frac))
    else:
        slots = ((l0, jnp.ones_like(frac)),)

    def generic_path():
        # Per-pixel level geometry via tiny [L]-table gathers instead
        # of an L-deep cascade of full-image lattice_setups (the
        # cascade was 2L elementwise setups over every pixel —
        # measurable XLA glue at 4M pixels x L=10).
        eoff_a = jnp.asarray([e[0] for e in emeta_t], jnp.int32)
        hl_a = jnp.asarray([e[1] for e in emeta_t], jnp.int32)
        wl_a = jnp.asarray([e[2] for e in emeta_t], jnp.int32)
        hep_a = jnp.asarray([e[3] for e in emeta_t], jnp.int32)
        wep_a = jnp.asarray([e[4] for e in emeta_t], jnp.int32)
        ids_parts = []
        vals_parts = []
        eoffr_a = jnp.asarray([e[0] for e in emeta], jnp.int32)
        for lsel, lw in slots:
            hl = jnp.take(hl_a, lsel)
            wl = jnp.take(wl_a, lsel)
            ju, jv, w4s = lattice_setup(ut, vt, hl, wl, boundary_mode)
            dlw = dyt * lw[None, :]  # [C, Np]
            if _TILED_IDS:
                hep = jnp.take(hep_a, lsel)
                wep = jnp.take(wep_a, lsel)
                eoff_t = jnp.take(eoff_a, lsel)
            else:
                ws = wl + 2
                eid0 = (jnp.take(eoffr_a, lsel) + tzt * ((hl + 2) * ws)
                        + (jv + 1) * ws + (ju + 1))
            for dv in (0, 1):  # cell row dv: corners (0, dv), (1, dv)
                if _TILED_IDS:
                    ids_parts.append(tiled_apron_id(eoff_t, hep, wep, tzt,
                                                    jv + 1 + dv, ju + 1))
                else:
                    ids_parts.append(eid0 + dv * ws)
                vals_parts.append(jnp.concatenate(
                    [dlw * w4s[2 * dv][None], dlw * w4s[2 * dv + 1][None]],
                    axis=0))  # [2C, Np], du-major
        g_ext_t = scatter_add_by_id(
            jnp.concatenate(ids_parts),
            jnp.concatenate(vals_parts, axis=-1),
            NTe_t if _TILED_IDS else NTe, coherent=True,
            p_chunk=_SCAT_P_CHUNK).T  # [2C, rows]
        if _TILED_IDS:
            g_ext = untile_ext_grad(g_ext_t, emeta_t, L, B_tex)
        else:
            g_ext = g_ext_t
        return fold_ext_grad(g_ext, meta, L, B_tex, boundary_mode, C)

    if _SEP_SCATTER and B_tex == 1 and _TILED_IDS:
        from .lattice_scatter import lattice_scatter_grad

        g_flat = lattice_scatter_grad(
            ut, vt, dyt, slots, emeta_t, meta, L, boundary_mode, C,
            generic_path, interpret=interpret)
    else:
        g_flat = generic_path()

    return (g_flat, gu, gv, gfl, None)


sample_fused.defvjp(_sample_fwd, _sample_bwd)


# ---------------------------------------------------------------------------
# Cube maps. Kernel-safe re-statements of the geometric seam wrap
# (texture.py:_cube_face_direction/_cube_faceid/_cube_project) using
# only 2-D wheres — no stacked [6, ...] intermediates, which Mosaic
# cannot lower. Reference: csrc/common/texture_kernel.cu:26-120,
# 591-639 (LUT wrap + corner averaging).
# ---------------------------------------------------------------------------

def _face_dir_2d(face, s, t):
    """Texel (s, t) on `face` -> direction (chained-where form)."""
    du = 2.0 * (s - 0.5)
    dv = 2.0 * (t - 0.5)
    one = jnp.ones_like(du)
    x = jnp.where(face == 0, one,
                  jnp.where(face == 1, -one,
                            jnp.where(face == 5, -du, du)))
    y = jnp.where(face == 2, one,
                  jnp.where(face == 3, -one, -dv))
    z = jnp.where(face == 0, -du,
                  jnp.where(face == 1, du,
                            jnp.where(face == 2, dv,
                                      jnp.where(face == 3, -dv,
                                                jnp.where(face == 4, one,
                                                          -one)))))
    return x, y, z


def _faceid_project_2d(x, y, z):
    """Direction -> (face, s, t) (chained-where form)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    az = jnp.abs(z)
    z_major = az > jnp.maximum(ax, ay)
    y_major = (~z_major) & (ay > ax)
    x_major = ~(z_major | y_major)
    c = jnp.where(z_major, z, jnp.where(y_major, y, x))
    base = jnp.where(z_major, 4, jnp.where(y_major, 2, 0))
    face = base + (c < 0).astype(base.dtype)
    u_in = jnp.where(x_major, z, x)
    v_in = jnp.where(y_major, z, y)
    ok = jnp.abs(c) > 0
    m = 0.5 / jnp.where(ok, jnp.abs(c), 1.0)
    m0 = jnp.where((face == 0) | (face == 5), -m, m)
    m1 = jnp.where(face == 2, m, -m)
    return face, u_in * m0 + 0.5, v_in * m1 + 0.5


def _wrap_corner_2d(face, ix, iy, w):
    """(face, ix, iy) with possible 1-texel overflow -> wrapped
    (face', ix', iy', valid). Diagonal (cube-corner) overflows are
    invalid — filled by the average-of-3 rule."""
    ix_out = (ix < 0) | (ix >= w)
    iy_out = (iy < 0) | (iy >= w)
    corner = ix_out & iy_out
    inface = ~(ix_out | iy_out)

    wf = _f32s(w)
    s = (ix.astype(jnp.float32) + 0.5) / wf
    t = (iy.astype(jnp.float32) + 0.5) / wf
    dx, dy, dz = _face_dir_2d(face, s, t)
    nface, s2, t2 = _faceid_project_2d(dx, dy, dz)
    nix = jnp.clip(jnp.round(s2 * wf - 0.5).astype(jnp.int32), 0, w - 1)
    niy = jnp.clip(jnp.round(t2 * wf - 0.5).astype(jnp.int32), 0, w - 1)

    rface = jnp.where(inface, face, nface)
    rix = jnp.where(inface, jnp.clip(ix, 0, w - 1), nix)
    riy = jnp.where(inface, jnp.clip(iy, 0, w - 1), niy)
    return rface, rix, riy, ~corner


def cube_corner_setup(s, t, face, wl):
    """Bilinear corner addressing on a cube face of size wl (a Python
    int, or a traced int32 scalar under the dynamic-meta level loop).

    Returns (rows4, cols4, ok4, fu, fv, w4): per-corner face-combined
    row index (face*wl + iy), column, validity (0/1 float), fractions,
    and bilinear weights WITHOUT validity folded (the average-of-3
    substitution needs them separate)."""
    w = _f32s(wl)
    u = s * w - 0.5
    v = t * w - 0.5
    iu0 = jnp.floor(u).astype(jnp.int32)
    iv0 = jnp.floor(v).astype(jnp.int32)
    iu1 = iu0 + 1
    iv1 = iv0 + 1
    fu = u - iu0.astype(jnp.float32)
    fv = v - iv0.astype(jnp.float32)

    rows4 = []
    cols4 = []
    ok4 = []
    for ix, iy in ((iu0, iv0), (iu1, iv0), (iu0, iv1), (iu1, iv1)):
        f_c, x_c, y_c, ok_c = _wrap_corner_2d(face, ix, iy, wl)
        rows4.append(f_c * wl + y_c)
        cols4.append(x_c)
        ok4.append(ok_c.astype(jnp.float32))

    gu = 1.0 - fu
    gv = 1.0 - fv
    w4 = (gu * gv, fu * gv, gu * fv, fu * fv)
    return tuple(rows4), tuple(cols4), tuple(ok4), fu, fv, w4


def _build_cube_kernel(mode, C, L, meta_k, filter_mode, n_big=0,
                       dyn_levels=False):
    """Cube sampler kernel. meta_k entries are ('vmem', off_rel, w) or
    ('hbm', big_idx, w, wlp) per level (see _build_kernel). With
    dyn_levels the VMEM tail is walked by a fori_loop over an SMEM
    (off_rel, w) meta array — same compile-size rationale as
    _build_kernel."""
    split = n_big

    def kernel(*refs):
        if dyn_levels:
            meta_ref, *refs = refs
        tbl_ref = refs[0]
        big_refs = refs[1:1 + n_big]
        rest = refs[1 + n_big:]
        if mode == "fwd":
            (s_ref, t_ref, fl_ref, fin_ref, face_ref, tz_ref,
             out_ref, *scr) = rest
        else:
            (s_ref, t_ref, fl_ref, fin_ref, face_ref, tz_ref,
             dy_ref, gs_ref, gt_ref, gfl_ref, *scr) = rest
        if n_big:
            q_ref, wscr_ref, sem = scr
        else:
            (q_ref,) = scr

        sv = s_ref[...]
        tv = t_ref[...]
        fl = fl_ref[...]
        finite = fin_ref[...] != 0
        face = face_ref[...]
        tz = tz_ref[...]
        l0, l1, frac = level_weights(fl, L, filter_mode)
        # Block-level active range (see _build_kernel): only levels in
        # [lmin, lmax] can have active pixels.
        lmin = jnp.min(l0)
        lmax = jnp.max(l1)

        if mode == "fwd":
            for c in range(C):
                out_ref[c] = jnp.zeros(sv.shape, jnp.float32)
        else:
            dy = [dy_ref[c] for c in range(C)]
            gs_ref[...] = jnp.zeros(sv.shape, jnp.float32)
            gt_ref[...] = jnp.zeros(sv.shape, jnp.float32)
            gfl_ref[...] = jnp.zeros(sv.shape, jnp.float32)

        def level_term(lev, hbm_ent, off, wl):
            """One cube mip level (static or dynamic meta — see
            _build_kernel.level_term)."""
            on0 = l0 == lev
            on1 = l1 == lev
            active = (on0 | on1) & finite

            @pl.when(jnp.any(active))
            def _level_body():
                wgt = (jnp.where(on0, 1.0 - frac, 0.0)
                       + jnp.where(on1, frac, 0.0))

                rows4, cols4, ok4, fu, fv, w4 = cube_corner_setup(
                    sv, tv, face, wl)
                # Face rows ride tz * 6 faces per image.
                rows4 = tuple(tz[0, 0] * (6 * wl) + r for r in rows4)
                if hbm_ent is not None:
                    _gather_big(big_refs[hbm_ent[1]], rows4, cols4,
                                hbm_ent[3], active, C, q_ref, wscr_ref,
                                sem)
                else:
                    _gather_rc(tbl_ref, rows4, cols4, off, wl, active, C,
                               q_ref)

                # Average-of-3 substitution for missing cube corners
                # (texture_kernel.cu:591-639): q'_i = ok ? q : avg(ok q).
                n_ok = jnp.maximum(ok4[0] + ok4[1] + ok4[2] + ok4[3], 1.0)
                if mode == "fwd":
                    for c in range(C):
                        q = [q_ref[4 * c + i] for i in range(4)]
                        avg = (ok4[0] * q[0] + ok4[1] * q[1]
                               + ok4[2] * q[2] + ok4[3] * q[3]) / n_ok
                        qq = [jnp.where(ok4[i] > 0, q[i], avg)
                              for i in range(4)]
                        val = (w4[0] * qq[0] + w4[1] * qq[1]
                               + w4[2] * qq[2] + w4[3] * qq[3])
                        out_ref[c] = out_ref[c] + jnp.where(
                            active, wgt * val, 0.0)
                else:
                    gu = jnp.zeros(sv.shape, jnp.float32)
                    gvv = jnp.zeros(sv.shape, jnp.float32)
                    gl = jnp.zeros(sv.shape, jnp.float32)
                    for c in range(C):
                        q = [q_ref[4 * c + i] for i in range(4)]
                        avg = (ok4[0] * q[0] + ok4[1] * q[1]
                               + ok4[2] * q[2] + ok4[3] * q[3]) / n_ok
                        qq = [jnp.where(ok4[i] > 0, q[i], avg)
                              for i in range(4)]
                        dqu = ((1.0 - fv) * (qq[1] - qq[0])
                               + fv * (qq[3] - qq[2]))
                        dqv = ((1.0 - fu) * (qq[2] - qq[0])
                               + fu * (qq[3] - qq[1]))
                        val = (w4[0] * qq[0] + w4[1] * qq[1]
                               + w4[2] * qq[2] + w4[3] * qq[3])
                        gu = gu + dy[c] * dqu
                        gvv = gvv + dy[c] * dqv
                        gl = gl + dy[c] * val
                    gs_ref[...] = gs_ref[...] + jnp.where(
                        active, wgt * gu * _f32s(wl), 0.0)
                    gt_ref[...] = gt_ref[...] + jnp.where(
                        active, wgt * gvv * _f32s(wl), 0.0)
                    dwdf = (jnp.where(on1, 1.0, 0.0)
                            - jnp.where(on0, 1.0, 0.0))
                    gfl_ref[...] = gfl_ref[...] + jnp.where(
                        active, dwdf * gl, 0.0)

        for lev in range(split):  # HBM levels: static (distinct refs)
            ent = meta_k[lev]
            level_term(lev, ent, None, ent[2])

        if dyn_levels and L > split:
            def lbody(lev, carry):
                level_term(lev, None, meta_ref[lev, 0], meta_ref[lev, 1])
                return carry

            jax.lax.fori_loop(jnp.maximum(lmin, split),
                              jnp.minimum(lmax, L - 1) + 1, lbody, 0)
        else:
            for lev in range(split, L):
                ent = meta_k[lev]
                level_term(lev, None, ent[1], ent[2])

    return kernel


def _call_cube(mode, flat_cm, s, t, flevel, finite, face, tz, dy_cm, meta,
               L, C, filter_mode, interpret=False):
    """All per-pixel arrays arrive tile-major (see _tile_order)."""
    N = s.shape[0]
    BLKR = TILE_H
    rows_p = N // LANE
    assert rows_p % BLKR == 0

    # Big cube levels live in HBM (windowed gather), same split rule
    # as the 2D sampler; rows carry (tz*6 + face) * w.
    NT = flat_cm.shape[1]
    split = _split_levels(meta, L, C, NT)
    bigs = []
    meta_k = []
    for lev in range(L):
        off, wl, _ = meta[lev]
        if lev < split:
            nxt = meta[lev + 1][0] if lev + 1 < L else NT
            bh = (nxt - off) // wl
            wlp = _cdiv(wl, LANE) * LANE
            blk = flat_cm[:, off:nxt].reshape(C, bh, wl)
            if wlp != wl:
                blk = jnp.pad(blk, ((0, 0), (0, 0), (0, wlp - wl)))
            bigs.append(blk.reshape(C, bh, wlp // LANE, LANE))
            meta_k.append(("hbm", len(bigs) - 1, wl, wlp))
        else:
            meta_k.append(("vmem", off - meta[split][0], wl))

    tbl3 = _prep_table(flat_cm[:, meta[split][0]:])
    HI = tbl3.shape[1]

    args = [_flatpad(a, rows_p) for a in (s, t, flevel)]
    args.append(_flatpad(finite.astype(jnp.int32), rows_p))
    args.append(_flatpad(face, rows_p))
    args.append(_flatpad(tz, rows_p))
    if mode == "bwd":
        args.append(_flatpad(dy_cm, rows_p))

    flat_spec = pl.BlockSpec((BLKR, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((C, BLKR, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((C, HI, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    big_spec = pl.BlockSpec(memory_space=pl.ANY)

    dyn_levels = _DYN_LEVEL_LOOP and L > len(bigs)
    meta_in = []
    in_specs = []
    if dyn_levels:
        meta_in = [jnp.asarray(
            [[ent[1] if ent[0] == "vmem" else 0, ent[2]]
             for ent in meta_k], dtype=jnp.int32)]
        in_specs.append(pl.BlockSpec((L, 2), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    in_specs += [tbl_spec] + [big_spec] * len(bigs) + [flat_spec] * 6
    if mode == "bwd":
        in_specs.append(chan_spec)
        out_specs = [flat_spec] * 3
        out_shape = [jax.ShapeDtypeStruct((rows_p, LANE), jnp.float32)] * 3
    else:
        out_specs = [chan_spec]
        out_shape = [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32)]

    scratch = [pltpu.VMEM((4 * C, BLKR, LANE), jnp.float32)]
    if bigs:
        # 2-slot window scratch + semaphores: _gather_big
        # double-buffers the interior column sweep.
        scratch += [pltpu.VMEM((2, C, _WIN_ROWS, LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]

    kernel = _build_cube_kernel(mode, C, L, tuple(meta_k), filter_mode,
                                n_big=len(bigs), dyn_levels=dyn_levels)
    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // BLKR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*meta_in, tbl3, *bigs, *args)

    def unflat(a):
        return a.reshape(a.shape[:-2] + (rows_p * LANE,))[..., :N]

    if mode == "fwd":
        return unflat(outs[0])
    return tuple(unflat(o) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def sample_cube_fused(flat_cm, s, t, flevel, finite, face, tz, meta, L,
                      filter_mode, shape, interpret):
    """Seamless cube-map sample. flat_cm: [C, NT] channel-major packed
    pyramid of [D, 6, w, w, C] levels; s, t, flevel flat [N] (s, t from
    the differentiable face projection, clamped to [0, 1]); finite:
    [N] bool valid-lookup mask; face, tz: [N] int32. Returns [C, N]."""
    C = flat_cm.shape[0]
    B, H, W = shape
    st_, tt_, flt = (_tile_order(a, B, H, W) for a in (s, t, flevel))
    fint = _tile_order(finite, B, H, W, fill=False)
    facet = _tile_order(face, B, H, W)
    tzt = _tile_order(tz, B, H, W)
    out = _call_cube("fwd", flat_cm, st_, tt_, flt, fint, facet, tzt, None,
                     meta, L, C, filter_mode, interpret=interpret)
    return _tile_unorder(out, B, H, W)


def _sample_cube_fwd(flat_cm, s, t, flevel, finite, face, tz, meta, L,
                     filter_mode, shape, interpret):
    out = sample_cube_fused(flat_cm, s, t, flevel, finite, face, tz, meta,
                            L, filter_mode, shape, interpret)
    return out, (flat_cm, s, t, flevel, finite, face, tz)


def _sample_cube_bwd(meta, L, filter_mode, shape, interpret, saved, dy):
    import numpy as np

    from .scatter import scatter_add_by_id

    flat_cm, s, t, flevel, finite, face, tz = saved
    C, NT = flat_cm.shape
    B, H, W = shape

    st_, tt_, flt = (_tile_order(a, B, H, W) for a in (s, t, flevel))
    fint = _tile_order(finite, B, H, W, fill=False)
    facet = _tile_order(face, B, H, W)
    tzt = _tile_order(tz, B, H, W)
    dyt = _tile_order(dy, B, H, W, fill=0.0)

    gs, gt_, gfl = _call_cube(
        "bwd", flat_cm, st_, tt_, flt, fint, facet, tzt, dyt, meta, L, C,
        filter_mode, interpret=interpret)
    gs = _tile_unorder(gs, B, H, W)
    gt_ = _tile_unorder(gt_, B, H, W)
    gfl = _tile_unorder(gfl, B, H, W)

    # Texture gradients: recompute corner ids + effective weights
    # (average-of-3 redistributes invalid-corner weight onto the valid
    # corners: w_eff[j] = w_j ok_j + ok_j/n_ok * sum_i w_i (1 - ok_i)).
    l0, l1, frac = level_weights(flt, L, filter_mode)
    if filter_mode == "linear-mipmap-linear":
        slots = ((l0, 1.0 - frac), (l1, frac))
    else:
        slots = ((l0, jnp.ones_like(frac)),)
    # Seam wrap sends corners to other faces, so ids are not
    # lattice-regular (no apron trick); still, all corner streams of
    # all mip slots are concatenated into ONE scatter call — one VMEM
    # accumulator init and no inter-call table adds.
    # Per-pixel level geometry from tiny [L]-table gathers (see
    # _sample_bwd — replaces the L-deep full-image cascade; the cube
    # wrap machinery in cube_corner_setup is array-dim safe).
    off_a = jnp.asarray([m[0] for m in meta[:L]], jnp.int32)
    wl_a = jnp.asarray([m[1] for m in meta[:L]], jnp.int32)
    ids_parts = []
    vals_parts = []
    for lsel, lw in slots:
        wl = jnp.take(wl_a, lsel)
        rows4, cols4, ok4, fu, fv, w4 = cube_corner_setup(
            st_, tt_, facet, wl)
        inv_w = sum(w4[i] * (1.0 - ok4[i]) for i in range(4))
        n_ok = jnp.maximum(ok4[0] + ok4[1] + ok4[2] + ok4[3], 1.0)
        base = jnp.take(off_a, lsel) + tzt * (6 * wl * wl)
        ids4 = [base + rows4[i] * wl + cols4[i] for i in range(4)]
        w4s = [(w4[i] * ok4[i] + ok4[i] / n_ok * inv_w)
               * fint.astype(jnp.float32) for i in range(4)]
        for corner in range(4):
            ids_parts.append(ids4[corner])
            vals_parts.append(dyt * (w4s[corner] * lw)[None, :])
    g_flat = scatter_add_by_id(
        jnp.concatenate(ids_parts), jnp.concatenate(vals_parts, axis=-1),
        NT, coherent=True,
        p_chunk=_SCAT_P_CHUNK).T  # [C, NT] (tile-ordered -> sorted-ish)

    def int0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (g_flat, gs, gt_, gfl, int0(finite), int0(face), int0(tz))


sample_cube_fused.defvjp(_sample_cube_fwd, _sample_cube_bwd)
