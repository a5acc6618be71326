"""Fused Pallas TPU sampler for 2D textures (all linear filter modes).

The XLA path (texture.py) pays ~9-25 ns per texel lookup in XLA's
gather lowering — at 2048² trilinear that is 8 corner gathers of 4M
rows plus per-pixel mip-metadata gathers, ~100-200 ms. This kernel
keeps the whole flat-packed mip pyramid resident in VMEM
(channel-major) and resolves all corners of all levels in one pass:

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_H = 64  # image-tile rows per kernel block (x128 columns)
_MAX_VMEM_TABLE = 1 << 21  # pyramid floats kept in VMEM (8 MB f32)
_MAX_CHANNELS = 8
_MIN_N = 1 << 16  # below this XLA gather overhead is acceptable


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


def supported(C, n_texels, N, cube_mode, boundary_mode, force=False):
    """Can the fused path serve this config? `force` skips the
    profitability heuristic (explicit impl= request)."""
    return (not cube_mode
            and boundary_mode in ("wrap", "clamp", "zero")
            and C <= _MAX_CHANNELS
            and (force or N >= _MIN_N)
            and C * _cdiv(n_texels, LANE) * LANE <= _MAX_VMEM_TABLE)


# ---------------------------------------------------------------------------
# Corner setup — pure jnp, shared by the kernels and the host-side
# gradient scatter. Mirrors texture.py:_linear_setup_2d /
# indexTextureLinear (texture_kernel.cu:368-472).
# ---------------------------------------------------------------------------

def corner_setup(u, v, hi, wi, boundary_mode):
    """Bilinear corner addressing at one level (static hi, wi ints).

    Args:
      u, v: raw uv arrays (any shape).
      hi, wi: level height/width (Python ints).
      boundary_mode: 'wrap' | 'clamp' | 'zero'.

    Returns (iu0, iu1, iv0, iv1, fu, fv, w4, ok4) where the integer
    corner coordinates are clamped into range, w4 is a tuple of the 4
    bilinear weights in (00, 10, 01, 11) order with zero-boundary
    validity folded in, and ok4 are the validity masks as 0/1 floats
    (all ones for wrap/clamp).
    """
    w = jnp.float32(wi)
    h = jnp.float32(hi)
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
    """q_ref[4c + corner] <- tbl[c, corner texel] for active pixels.

    2-D bounded sweep: iterates the texel ROWS of the block's uv
    bounding box, and within each row only the 128-lane chunks its
    u-range touches — so cost scales with the bbox area, not with the
    texture width (a flat id sweep would walk every chunk of every
    bbox row). `base_s` is the block-constant row-0 flat offset
    (level offset + tz * level texels; tz is constant per block since
    blocks never straddle minibatch images).
    """
    iu0, iu1, iv0, iv1 = setup[:4]
    ids4 = (base_s + iv0 * wl + iu0, base_s + iv0 * wl + iu1,
            base_s + iv1 * wl + iu0, base_s + iv1 * wl + iu1)
    his = [i >> 7 for i in ids4]
    los = [i & 127 for i in ids4]
    shape = iu0.shape
    big = jnp.int32(1 << 30)

    def mmin(a, b):
        return jnp.min(jnp.where(active, jnp.minimum(a, b), big))

    def mmax(a, b):
        return jnp.max(jnp.where(active, jnp.maximum(a, b), -1))

    umin = mmin(iu0, iu1)
    umax = mmax(iu0, iu1)
    rmin = mmin(iv0, iv1)
    rmax = mmax(iv0, iv1)

    # Row clusters: blocks routinely mix a few exact far-apart row
    # values with a compact interval — e.g. background pixels at
    # uv = (0, 0) in wrap mode touch texel rows {0, wl-1} while the
    # surface pixels occupy a narrow band. Visiting the two extreme
    # rows explicitly and sweeping only the strictly-interior interval
    # keeps the loop linear in *occupied* rows, not the bbox height.
    any_act = rmax >= 0
    r_first = jnp.where(any_act, rmin, 0)
    r_last = jnp.where(any_act, rmax, 0)
    in0 = active & (iv0 > r_first) & (iv0 < r_last)
    in1 = active & (iv1 > r_first) & (iv1 < r_last)
    rmin2 = jnp.min(jnp.minimum(jnp.where(in0, iv0, big),
                                jnp.where(in1, iv1, big)))
    rmax2 = jnp.max(jnp.maximum(jnp.where(in0, iv0, -1),
                                jnp.where(in1, iv1, -1)))

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


def _build_kernel(mode, C, L, meta, boundary_mode, filter_mode):
    """mode: 'fwd' emits [C] filtered color; 'bwd' emits (gu, gv, gfl).

    meta: tuple of (off, h, w) Python ints per level. The per-pixel
    minibatch texture index tz arrives as an input array so the kernel
    is minibatch-agnostic.
    """

    def kernel(*refs):
        if mode == "fwd":
            (tbl_ref, u_ref, v_ref, fl_ref, tz_ref, out_ref, q_ref) = refs
        else:
            (tbl_ref, u_ref, v_ref, fl_ref, tz_ref, dy_ref,
             gu_ref, gv_ref, gfl_ref, q_ref) = refs

        u = u_ref[...]
        v = v_ref[...]
        fl = fl_ref[...]
        tz = tz_ref[...]
        l0, l1, frac = level_weights(fl, L, filter_mode)

        if mode == "fwd":
            for c in range(C):
                out_ref[c] = jnp.zeros(u.shape, jnp.float32)
        else:
            dy = [dy_ref[c] for c in range(C)]
            gu_ref[...] = jnp.zeros(u.shape, jnp.float32)
            gv_ref[...] = jnp.zeros(u.shape, jnp.float32)
            gfl_ref[...] = jnp.zeros(u.shape, jnp.float32)

        for lev in range(L):
            off, hl, wl = meta[lev]
            on0 = l0 == lev
            on1 = l1 == lev
            active = on0 | on1
            # Per-level blend weight: (1-frac) on l0 plus frac on l1;
            # both when l0 == l1 (sum = 1).
            wgt = (jnp.where(on0, 1.0 - frac, 0.0)
                   + jnp.where(on1, frac, 0.0))

            setup = corner_setup(u, v, hl, wl, boundary_mode)
            # tz is block-constant (blocks never straddle images).
            base_s = off + tz[0, 0] * (hl * wl)
            _gather_corners(tbl_ref, setup, base_s, wl, active, C, q_ref)
            fu, fv, w4, ok4 = setup[4], setup[5], setup[6], setup[7]

            if mode == "fwd":
                for c in range(C):
                    val = (w4[0] * q_ref[4 * c + 0]
                           + w4[1] * q_ref[4 * c + 1]
                           + w4[2] * q_ref[4 * c + 2]
                           + w4[3] * q_ref[4 * c + 3])
                    out_ref[c] = out_ref[c] + jnp.where(active, wgt * val,
                                                        0.0)
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
                        # Invalid corners contribute 0 to the value and
                        # to its uv derivative (w4 carries validity but
                        # the derivative combos need masked values).
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
                # fu = u * wl - 0.5 (wrap/zero) -> d fu/du = wl; clamp
                # edges zero the derivative through q10 == q00 instead.
                gu_ref[...] = gu_ref[...] + jnp.where(active,
                                                      wgt * gu * wl, 0.0)
                gv_ref[...] = gv_ref[...] + jnp.where(active,
                                                      wgt * gv * hl, 0.0)
                # d out/d flevel = val(l1) - val(l0).
                dwdf = (jnp.where(on1, 1.0, 0.0)
                        - jnp.where(on0, 1.0, 0.0))
                gfl_ref[...] = gfl_ref[...] + jnp.where(active, dwdf * gl,
                                                        0.0)

    return kernel


def _call_sampler(mode, flat_cm, u, v, flevel, tz, dy_cm, meta, L, C,
                  boundary_mode, filter_mode, interpret=False):
    """All per-pixel arrays arrive tile-major (see _tile_order), with
    length a multiple of TILE_H * LANE: one kernel block = one tile."""
    N = u.shape[0]
    BLKR = TILE_H
    rows_p = N // LANE
    assert rows_p % BLKR == 0

    tbl3 = _prep_table(flat_cm)
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

    in_specs = [tbl_spec] + [flat_spec] * 4
    if mode == "bwd":
        in_specs.append(chan_spec)
        out_specs = [flat_spec] * 3
        out_shape = [jax.ShapeDtypeStruct((rows_p, LANE), jnp.float32)] * 3
    else:
        out_specs = [chan_spec]
        out_shape = [jax.ShapeDtypeStruct((C, rows_p, LANE), jnp.float32)]

    kernel = _build_kernel(mode, C, L, meta, boundary_mode, filter_mode)
    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // BLKR,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4 * C, BLKR, LANE), jnp.float32)],
        interpret=interpret,
    )(tbl3, *args)

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
    out = sample_fused(flat_cm, u, v, flevel, tz, meta, L, boundary_mode,
                       filter_mode, shape, interpret)
    return out, (flat_cm, u, v, flevel, tz)


def _sample_bwd(meta, L, boundary_mode, filter_mode, shape, interpret,
                saved, dy):
    from .scatter import scatter_add_by_id

    flat_cm, u, v, flevel, tz = saved
    C, NT = flat_cm.shape
    B, H, W = shape

    # Tile-major order: compact per-block uv ranges for the kernel AND
    # window-local texel ids for the MXU scatter. Padding pixels carry
    # dy = 0 so their (edge-replicated uv) ids scatter nothing.
    ut, vt, flt, tzt = (_tile_order(a, B, H, W)
                        for a in (u, v, flevel, tz))
    dyt = _tile_order(dy, B, H, W, fill=0.0)
    l0, l1, frac = level_weights(flt, L, filter_mode)

    gu, gv, gfl = _call_sampler(
        "bwd", flat_cm, ut, vt, flt, tzt, dyt, meta, L, C, boundary_mode,
        filter_mode, interpret=interpret)
    gu = _tile_unorder(gu, B, H, W)
    gv = _tile_unorder(gv, B, H, W)
    gfl = _tile_unorder(gfl, B, H, W)

    # Texture gradient: recompute ids/weights per level slot
    # (elementwise, no gathers) and scatter dy * w on the MXU kernel.
    g_flat = None
    if filter_mode == "linear-mipmap-linear":
        slots = ((l0, 1.0 - frac), (l1, frac))
    else:
        slots = ((l0, jnp.ones_like(frac)),)
    for lsel, lw in slots:
        # Select per-pixel level geometry by static-level cascade.
        ids4 = None
        w4s = None
        for lev in range(L):
            off, hl, wl = meta[lev]
            on = lsel == lev
            setup = corner_setup(ut, vt, hl, wl, boundary_mode)
            base = off + tzt * (hl * wl)
            c_ids = corner_ids(setup, base, wl)
            c_w = setup[6]
            if ids4 is None:
                ids4 = [jnp.where(on, i, 0) for i in c_ids]
                w4s = [jnp.where(on, w, 0.0) for w in c_w]
            else:
                ids4 = [jnp.where(on, i, p) for i, p in zip(c_ids, ids4)]
                w4s = [jnp.where(on, w, p) for w, p in zip(c_w, w4s)]
        for corner in range(4):
            vals = dyt * (w4s[corner] * lw)[None, :]  # [C, Np]
            g = scatter_add_by_id(ids4[corner], vals, NT).T  # [C, NT]
            g_flat = g if g_flat is None else g_flat + g

    return (g_flat, gu, gv, gfl, None)


sample_fused.defvjp(_sample_fwd, _sample_bwd)
