"""Differentiable antialiasing.

TPU-native re-design of the reference antialias op
(csrc/common/antialias.cu, csrc/torch/torch_antialias.cpp):

* The GPU edge hash becomes a sorted opposite-vertex table
  (:mod:`nvdiffrast_tpu.ops.topology`).
* The discontinuity + persistent-threads analysis kernels
  (antialias.cu:165-382) become **dense masked compute** over all
  horizontal and vertical pixel pairs — the TPU idiom replacing
  dynamic work queues; inactive pairs simply contribute zero.
* Data flow is flat-SoA (same design as rasterize/interpolate): all
  per-pixel state is [N] / [N, K] with the pixel axis major, the
  per-triangle screen-space geometry (own + opposite vertices, with
  the silhouette fold ov=own handled per triangle) is ONE row-gather
  from a [T(+1), 12] table, and neighbor access is a flat roll with
  border masking instead of image-shaped shifts.
* Color updates use rolled adds instead of atomics; position
  gradients reduce pixels -> triangle rows on the MXU (one-hot
  matmul) then triangle -> vertex with a tiny scatter.

The per-pair analysis math (closer-triangle selection, wing-sign
silhouette test, rational edge argmax, crossing-point alpha) and the
backward formulas (color cross-gradients, analytic d(alpha)/d(p1,p2)
with copysign(1e-3, dy) regularization, |alpha| >= 0.5 saturation
kill) are exact re-derivations of antialias.cu:219-556.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import coord
from .gather import table_take
from .scatter import scatter_add_by_id
from .topology import build_opposite_table

_F32_MAX = jnp.float32(3.402823466e38)


def _int_zero_ct(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.tree_util.register_pytree_node_class
class TopologyHashWrapper:
    """Opaque topology table (reference: csrc/torch/torch_types.h:41-45)."""

    def __init__(self, op_table):
        self.op_table = op_table

    def tree_flatten(self):
        return (self.op_table,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def antialias_construct_topology_hash(tri):
    """Construct a topology table for a triangle tensor.

    API parity with the reference (nvdiffrast/torch/ops.py:529-544).

    Args:
        tri: Triangle tensor with shape [num_triangles, 3], int32.

    Returns:
        An opaque `TopologyHashWrapper` usable as the `topology_hash`
        argument of `antialias()`.
    """
    tri = jnp.asarray(tri, jnp.int32)
    return TopologyHashWrapper(build_opposite_table(tri))


# ---------------------------------------------------------------------------
# Shared helpers (bit-faithful sign/rational comparisons,
# antialias.cu:14-25).
# ---------------------------------------------------------------------------

def _same_sign(a, b):
    return jnp.signbit(a) == jnp.signbit(b)


def _rational_gt(n0, n1, d0, d1):
    return (n0 * d1 > n1 * d0) == _same_sign(d0, d1)


def _max_idx3(n0, n1, n2, d0, d1, d2):
    g10 = _rational_gt(n1, n0, d1, d0)
    g20 = _rational_gt(n2, n0, d2, d0)
    g21 = _rational_gt(n2, n1, d2, d1)
    return jnp.where(g20 & g21, 2, jnp.where(g10, 1, 0))


def _roll_prev(x, stride):
    """x at the neighbor pixel (p + stride); tail garbage is masked."""
    return jnp.concatenate([x[stride:], x[-stride:]], axis=0)


def _roll_next(x, stride):
    """Scatter from p onto p + stride (zero-filled head)."""
    pad_shape = (stride,) + x.shape[1:]
    return jnp.concatenate([jnp.zeros(pad_shape, x.dtype), x[:-stride]],
                           axis=0)


def _build_tables(pos, tri, op_table, instance_mode, H, W):
    """Per-triangle screen/clip tables (channel-major) + dummy column.

    Returns (ftable [12, (B*)T+1], btable [9, (B*)T+1], R, T).
    ftable: own-vertex screen (SX*3, SY*3), opposite screen (OX*3, OY*3),
    with the silhouette fold (missing opposite -> own vertex e).
    btable: raw clip (x, y, w) per vertex for the backward.
    """
    T = tri.shape[0]
    xh = 0.5 * W
    yh = 0.5 * H
    ov = jnp.where(op_table >= 0, op_table, tri)  # [T, 3]

    if instance_mode:
        tv = pos[:, tri]  # [B, T, 3, 4]
        o = pos[:, ov]
    else:
        tv = pos[tri]
        o = pos[ov]

    def screen(q):
        iw = 1.0 / q[..., 3]
        return q[..., 0] * iw * xh, q[..., 1] * iw * yh

    sx, sy = screen(tv)
    ox, oy = screen(o)
    ftable = jnp.concatenate([sx, sy, ox, oy], axis=-1).reshape(-1, 12).T
    btable = tv[..., jnp.array([0, 1, 3])].reshape(-1, 9).T
    R = ftable.shape[1]
    ftable = jnp.concatenate([ftable, jnp.zeros((12, 1), jnp.float32)], 1)
    btable = jnp.concatenate([btable, jnp.zeros((9, 1), jnp.float32)], 1)
    return ftable, btable, R, T


def _pair_select(rast_flat, d, B, H, W, T, instance_mode):
    """Shared fwd/bwd pair analysis: which triangle, which pixel.

    Returns dict of flat [N] arrays: active-ish mask pieces, rid, tri1
    flag, pixel-space (fx, fy) of the chosen pixel.
    """
    N = B * H * W
    stride = 1 if d == 0 else W

    idf0 = rast_flat[:, 3]
    idf1 = _roll_prev(idf0, stride)
    z0 = rast_flat[:, 2]
    z1 = _roll_prev(z0, stride)

    pix = jnp.arange(N, dtype=jnp.int32)
    colp = pix % W
    rowp = (pix // W) % H
    if d == 0:
        border = colp >= W - 1
    else:
        border = rowp >= H - 1
    work = (idf1 != idf0) & ~border

    tri0 = coord.float_to_triidx(idf0) - 1
    tri1i = coord.float_to_triidx(idf1) - 1

    # Select triangle based on background / depth (antialias.cu:249-257).
    tsel = jnp.where(tri0 >= 0, tri0, tri1i)
    both = (tri0 >= 0) & (tri1i >= 0)
    tsel = jnp.where(both, jnp.where(z0 < z1, tri0, tri1i), tsel)
    is_t1 = tsel == tri1i  # note: work guarantees tri0 != tri1i

    tri_ok = (tsel >= 0) & (tsel < T)
    active = work & tri_ok
    tid = jnp.where(tri_ok, tsel, 0)
    # Inactive pixels point at their (clamped) local triangle rather
    # than a shared dummy column: the gathered values are masked out
    # downstream, and keeping ids spatially coherent preserves
    # table_take's per-block id-range skipping.
    if instance_mode:
        rid = tid + (pix // (H * W)) * T
    else:
        rid = tid

    # Pixel coords, possibly shifted to the neighbor (antialias.cu:252-257).
    shift = is_t1.astype(jnp.float32)
    px = colp.astype(jnp.float32) + shift * (1 - d)
    py = rowp.astype(jnp.float32) + shift * d
    fx = px + 0.5 - 0.5 * W
    fy = py + 0.5 - 0.5 * H
    return dict(active=active, rid=rid, is_t1=is_t1, fx=fx, fy=fy,
                idf0=idf0, idf1=idf1, stride=stride)


# ---------------------------------------------------------------------------
# Per-axis analysis (dense, flat SoA). axis d: 0 = right neighbor, 1 = down.
# ---------------------------------------------------------------------------

def _analyze_axis(color_cols, sel, t12, d, B, H, W):
    """Per-pixel-pair AA state for one axis (all flat 1D [N] arrays)."""
    active = sel["active"]
    fx = sel["fx"]
    fy = sel["fy"]
    is_t1 = sel["is_t1"]
    stride = sel["stride"]

    x0 = t12[0] - fx
    x1 = t12[1] - fx
    x2 = t12[2] - fx
    y0 = t12[3] - fy
    y1 = t12[4] - fy
    y2 = t12[5] - fy
    ox0 = t12[6] - fx
    ox1 = t12[7] - fx
    ox2 = t12[8] - fx
    oy0 = t12[9] - fy
    oy1 = t12[10] - fy
    oy2 = t12[11] - fy

    # Wing signs kill non-silhouette edges (antialias.cu:321-328).
    bb = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    a0 = (x1 - ox0) * (y2 - oy0) - (x2 - ox0) * (y1 - oy0)
    a1 = (x2 - ox1) * (y0 - oy1) - (x0 - ox1) * (y2 - oy1)
    a2 = (x0 - ox2) * (y1 - oy2) - (x1 - ox2) * (y0 - oy2)
    s0 = _same_sign(a0, bb)
    s1 = _same_sign(a1, bb)
    s2 = _same_sign(a2, bb)
    any_sil = s0 | s1 | s2

    # XY flip for horizontal edges (vertical pairs).
    if d == 1:
        x0, y0 = y0, x0
        x1, y1 = y1, x1
        x2, y2 = y2, x2

    dx0 = x2 - x1
    dx1 = x0 - x2
    dx2 = x1 - x0
    dy0 = y2 - y1
    dy1 = y0 - y2
    dy2 = y1 - y0

    ds = jnp.where(is_t1, -1.0, 1.0)
    d0 = ds * (x1 * dy0 - y1 * dx0)
    d1 = ds * (x2 * dy1 - y2 * dx1)
    d2 = ds * (x0 * dy2 - y0 * dx2)

    c0 = _same_sign(y1, y2)
    c1 = _same_sign(y2, y0)
    c2 = _same_sign(y0, y1)
    d0 = jnp.where(c0, -_F32_MAX, d0)
    d1 = jnp.where(c1, -_F32_MAX, d1)
    d2 = jnp.where(c2, -_F32_MAX, d2)
    dy0 = jnp.where(c0, 1.0, dy0)
    dy1 = jnp.where(c1, 1.0, dy1)
    dy2 = jnp.where(c2, 1.0, dy2)

    di = _max_idx3(d0, d1, d2, dy0, dy1, dy2)

    dc = jnp.full_like(d0, -_F32_MAX)
    use0 = (di == 0) & s0 & (jnp.abs(dy0) >= jnp.abs(dx0))
    use1 = (di == 1) & s1 & (jnp.abs(dy1) >= jnp.abs(dx1))
    use2 = (di == 2) & s2 & (jnp.abs(dy2) >= jnp.abs(dx2))
    dc = jnp.where(use0, d0 / dy0, dc)
    dc = jnp.where(use1, d1 / dy1, dc)
    dc = jnp.where(use2, d2 / dy2, dc)

    eps = 0.0625  # 1/16 pixel inaccuracy bound (antialias.cu:360)
    found = (dc > -eps) & (dc < 1.0 + eps)
    active = active & any_sil & found
    dcc = jnp.clip(dc, 0.0, 1.0)
    alpha = jnp.where(active, ds * (0.5 - dcc), 0.0)
    alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)

    # Per-channel 1D contributions (no lane-padded [N, 1] masks).
    contrib = [alpha * (_roll_prev(c, stride) - c) for c in color_cols]
    return alpha, di, is_t1, contrib, stride


def _aa_forward_core(color, rast, pos, tri, op_table):
    instance_mode = pos.ndim > 2
    B, H, W, C = color.shape
    N = B * H * W
    ftable, _, R, T = _build_tables(pos, tri, op_table, instance_mode, H, W)

    cflat = color.reshape(N, C)
    ccols = [cflat[:, c] for c in range(C)]
    rflat = rast.reshape(N, 4)

    # One batched table lookup for both axes.
    sels = [_pair_select(rflat, d, B, H, W, T, instance_mode) for d in (0, 1)]
    t12_all = table_take(
        ftable, jnp.concatenate([sels[0]["rid"], sels[1]["rid"]]))
    t12s = (t12_all[:, :N], t12_all[:, N:])

    out = list(ccols)
    res = []
    for d in (0, 1):
        alpha, di, tri1, contrib, stride = _analyze_axis(
            ccols, sels[d], t12s[d], d, B, H, W)
        apos = alpha > 0
        for c in range(C):
            pos_c = jnp.where(apos, contrib[c], 0.0)
            neg_c = jnp.where(apos, 0.0, contrib[c])
            out[c] = out[c] + pos_c + _roll_next(neg_c, stride)
        res.extend([alpha, di, tri1])
    return jnp.stack(out, axis=-1).reshape(B, H, W, C), tuple(res)


# ---------------------------------------------------------------------------
# Backward (re-derivation of AntialiasGradKernel, antialias.cu:387-556).
# ---------------------------------------------------------------------------

def _bwd_rid(rast_flat, alpha, tri1, d, B, H, W, T, instance_mode):
    """Row id of the triangle the forward analysis used, per pixel."""
    N = B * H * W
    stride = 1 if d == 0 else W
    idf0 = rast_flat[:, 3]
    idf1 = _roll_prev(idf0, stride)
    idf = jnp.where(tri1, idf1, idf0)
    tsel = coord.float_to_triidx(idf) - 1
    ok = (alpha != 0.0) & (tsel >= 0) & (tsel < T)
    tid = jnp.where(ok, tsel, 0)
    pix = jnp.arange(N, dtype=jnp.int32)
    if instance_mode:
        rid = tid + (pix // (H * W)) * T  # inactive -> local id (masked)
    else:
        rid = tid
    return rid, ok


def _aa_backward_axis(dy_cols, color_cols, t9, rid_ok, alpha, di,
                      tri1, d, B, H, W):
    N = B * H * W
    stride = 1 if d == 0 else W
    active = alpha != 0.0
    apos = alpha > 0

    # Per-channel: color cross-gradients (-v at pixel0, +v at pixel1,
    # antialias.cu:449-462) and the position gradient weight dd.
    g_color = []
    dd = jnp.zeros((N,), jnp.float32)
    for c in range(len(dy_cols)):
        pdy_c = jnp.where(apos, dy_cols[c], _roll_prev(dy_cols[c], stride))
        v_c = alpha * pdy_c
        g_color.append(-v_c + _roll_next(v_c, stride))
        dd = dd + pdy_c * (_roll_prev(color_cols[c], stride) - color_cols[c])
    dd = jnp.where(active, dd, 0.0)

    ok = rid_ok & (dd != 0.0)

    # Edge vertices (antialias.cu:470-474): i1 = di+1, i2 = di+2 (mod 3).
    i1 = jnp.where(di < 2, di + 1, 0)
    i2 = jnp.where(i1 < 2, i1 + 1, 0)

    # btable layout from _build_tables: reshape of [T, 3(vert), 3(xyw)]
    # -> row 3*vert + comp.
    def vert(idx, comp):
        r = t9[0 + comp]
        r = jnp.where(idx == 1, t9[3 + comp], r)
        r = jnp.where(idx == 2, t9[6 + comp], r)
        return r

    p1x = vert(i1, 0)
    p1y = vert(i1, 1)
    p1w = vert(i1, 2)
    p2x = vert(i2, 0)
    p2y = vert(i2, 1)
    p2w = vert(i2, 2)

    pix = jnp.arange(N, dtype=jnp.int32)
    shift = tri1.astype(jnp.float32)
    colp = (pix % W).astype(jnp.float32)
    rowp = ((pix // W) % H).astype(jnp.float32)
    px = colp + shift * (1 - d)
    py = rowp + shift * d

    pxh = 0.5 * W
    pyh = 0.5 * H
    fx = px + 0.5 - pxh
    fy = py + 0.5 - pyh

    if d == 1:
        p1x, p1y = p1y, p1x
        p2x, p2y = p2y, p2x
        pxh_, pyh_ = pyh, pxh
        fx, fy = fy, fx
    else:
        pxh_, pyh_ = pxh, pyh

    w1 = 1.0 / p1w
    w2 = 1.0 / p2w
    x1 = p1x * w1 * pxh_ - fx
    y1 = p1y * w1 * pyh_ - fy
    x2 = p2x * w2 * pxh_ - fx
    y2 = p2y * w2 * pyh_ - fy
    dxe = x2 - x1
    dye = y2 - y1
    db = x1 * dye - y1 * dxe

    ep = jnp.where(dye >= 0, 1e-3, -1e-3)  # copysign(1e-3, dy)
    iy = 1.0 / (dye + ep)

    dby = db * iy
    iw1 = -w1 * iy * dd
    iw2 = w2 * iy * dd
    gp1x = iw1 * pxh_ * y2
    gp2x = iw2 * pxh_ * y1
    gp1y = iw1 * pyh_ * (dby - x2)
    gp2y = iw2 * pyh_ * (dby - x1)
    gp1w = -(p1x * gp1x + p1y * gp1y) * w1
    gp2w = -(p2x * gp2x + p2y * gp2y) * w2

    if d == 1:
        gp1x, gp1y = gp1y, gp1x
        gp2x, gp2y = gp2y, gp2x

    # Saturated alpha kills position gradients (antialias.cu:542-546).
    sat = jnp.abs(alpha) >= 0.5
    keep = ok & ~sat

    # Route (g1, g2) into the per-triangle 9-column layout by edge
    # vertex index: column 3*vert + comp.
    g1 = [gp1x, gp1y, gp1w]
    g2 = [gp2x, gp2y, gp2w]
    cols = []
    for vtx in range(3):
        m1 = (i1 == vtx) & keep
        m2 = (i2 == vtx) & keep
        for comp in range(3):
            val = (jnp.where(m1, g1[comp], 0.0)
                   + jnp.where(m2, g2[comp], 0.0))
            cols.append(jnp.where(jnp.isfinite(val), val, 0.0))
    gval = jnp.stack(cols, axis=0)  # [9, N] channel-major
    return g_color, gval


def _aa_backward_core(dy, color, rast, pos, tri, op_table, residuals):
    (al0, di0, t10, al1, di1, t11) = residuals
    instance_mode = pos.ndim > 2
    B, H, W, C = color.shape
    N = B * H * W
    T = tri.shape[0]
    V = pos.shape[1] if instance_mode else pos.shape[0]

    _, btable, R, _ = _build_tables(pos, tri, op_table, instance_mode, H, W)
    cflat = color.reshape(N, C)
    ccols = [cflat[:, c] for c in range(C)]
    rflat = rast.reshape(N, 4)
    dyf = dy.reshape(N, C)
    dycols = [dyf[:, c] for c in range(C)]

    # One batched table lookup for both axes.
    rid0, ok0 = _bwd_rid(rflat, al0, t10, 0, B, H, W, T, instance_mode)
    rid1, ok1 = _bwd_rid(rflat, al1, t11, 1, B, H, W, T, instance_mode)
    t9_all = table_take(btable, jnp.concatenate([rid0, rid1]))
    gc0, gv0 = _aa_backward_axis(
        dycols, ccols, t9_all[:, :N], ok0, al0, di0, t10, 0, B, H, W)
    gc1, gv1 = _aa_backward_axis(
        dycols, ccols, t9_all[:, N:], ok1, al1, di1, t11, 1, B, H, W)
    g_color = jnp.stack(
        [dycols[c] + gc0[c] + gc1[c] for c in range(C)],
        axis=-1).reshape(B, H, W, C)

    # Pixels -> triangle rows (MXU one-hot), both axes in one reduction.
    gt = scatter_add_by_id(jnp.concatenate([rid0, rid1]),
                           jnp.concatenate([gv0, gv1], axis=1), R)
    gt = gt.reshape(-1, T, 3, 3)  # [B?, T, vert, (x, y, w)]

    gv = jnp.zeros(gt.shape[:-1] + (4,), jnp.float32)
    gv = gv.at[..., 0].set(gt[..., 0])
    gv = gv.at[..., 1].set(gt[..., 1])
    gv = gv.at[..., 3].set(gt[..., 2])
    if instance_mode:
        g_pos = jnp.zeros((B, V, 4), jnp.float32).at[:, tri].add(
            gv, mode="drop")
    else:
        g_pos = jnp.zeros((V, 4), jnp.float32).at[tri].add(
            gv[0], mode="drop")
    return g_color, g_pos


# ---------------------------------------------------------------------------
# custom_vjp wiring + public op.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _antialias_prim(color, rast, pos, tri, op_table, pos_gradient_boost):
    out, _ = _aa_forward_core(color, rast, pos, tri, op_table)
    return out

def _antialias_prim_fwd(color, rast, pos, tri, op_table, pos_gradient_boost):
    out, res = _aa_forward_core(color, rast, pos, tri, op_table)
    return out, (color, rast, pos, tri, op_table, res)


def _antialias_prim_bwd(pos_gradient_boost, saved, dy):
    color, rast, pos, tri, op_table, res = saved
    g_color, g_pos = _aa_backward_core(dy, color, rast, pos, tri, op_table,
                                       res)
    if pos_gradient_boost != 1.0:
        g_pos = g_pos * pos_gradient_boost
    g_rast = jnp.zeros_like(rast)
    return (g_color, g_rast, g_pos, _int_zero_ct(tri), _int_zero_ct(op_table))


_antialias_prim.defvjp(_antialias_prim_fwd, _antialias_prim_bwd)


def antialias(color, rast, pos, tri, topology_hash=None,
              pos_gradient_boost=1.0):
    """Perform antialiasing.

    API parity with the reference op (nvdiffrast/torch/ops.py:489-526).

    Silhouette edge classification is based on vertex indices: a vertex
    shared by multiple triangles must use the same index everywhere,
    otherwise edges are classified as silhouettes (same caveat as the
    reference).

    Args:
        color: Input image [minibatch_size, height, width, channels].
        rast: Main output tensor from `rasterize()`.
        pos: Vertex position tensor used in rasterization.
        tri: Triangle tensor used in rasterization.
        topology_hash: (Optional) `TopologyHashWrapper` from
            `antialias_construct_topology_hash()`.
        pos_gradient_boost: (Optional) multiplier for gradients
            propagated to `pos`.

    Returns:
        Antialiased image, same shape as `color`.
    """
    color = jnp.asarray(color, jnp.float32)
    rast = jnp.asarray(rast, jnp.float32)
    pos = jnp.asarray(pos, jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)

    # Host-side shape validation (reference: torch_antialias.cpp:79-86).
    if color.ndim != 4 or rast.ndim != 4 or rast.shape[3] != 4:
        raise ValueError(
            f"antialias: color must be [minibatch, H, W, C] and rast "
            f"[minibatch, H, W, 4]; got {color.shape}, {rast.shape}")
    if color.shape[:3] != rast.shape[:3]:
        raise ValueError(
            f"antialias: color {color.shape} and rast {rast.shape} "
            f"minibatch/resolution mismatch")
    if pos.ndim not in (2, 3) or pos.shape[-1] != 4:
        raise ValueError(
            f"antialias: pos must be [V, 4] or [minibatch, V, 4]; "
            f"got {pos.shape}")
    if pos.ndim == 3 and pos.shape[0] != color.shape[0]:
        # The instance-mode row lookup indexes a [minibatch*T] table; a
        # mismatched pos minibatch would silently gather clamped rows.
        raise ValueError(
            f"antialias: instanced pos minibatch {pos.shape[0]} != "
            f"color minibatch {color.shape[0]}")
    if tri.ndim != 2 or tri.shape[1] != 3:
        raise ValueError(
            f"antialias: tri must be [num_triangles, 3]; got {tri.shape}")

    if topology_hash is not None:
        assert isinstance(topology_hash, TopologyHashWrapper)
        op_table = topology_hash.op_table
    else:
        op_table = build_opposite_table(tri)

    with jax.named_scope("nvdiffrast.antialias"):
        return _antialias_prim(color, rast, pos, tri, op_table,
                               float(pos_gradient_boost))
