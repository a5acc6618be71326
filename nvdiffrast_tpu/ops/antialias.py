"""Differentiable antialiasing.

TPU-native re-design of the reference antialias op
(csrc/common/antialias.cu, csrc/torch/torch_antialias.cpp):

* The GPU edge hash becomes a sorted opposite-vertex table
  (:mod:`nvdiffrast_tpu.ops.topology`).
* The discontinuity + persistent-threads analysis kernels
  (antialias.cu:165-382) become **dense masked compute** over all
  horizontal and vertical pixel pairs — the TPU idiom replacing
  dynamic work queues; inactive pairs simply contribute zero.
* Color updates use shifted adds instead of atomics; position
  gradients use a deterministic scatter-add.

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


def _shift_prev(x, axis, d):
    """x at pixel1 position viewed from pixel0 (shift towards lower index)."""
    # value[pixel0_coords] = x[pixel0 + step]; edge rows/cols are
    # masked inactive by the caller, pad with edge values.
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(1, None)
    pad = [slice(None)] * x.ndim
    pad[axis] = slice(-1, None)
    return jnp.concatenate([x[tuple(idx)], x[tuple(pad)]], axis=axis)


def _shift_next(x, axis):
    """Scatter from pixel0 coords onto pixel1 coords (shift towards higher)."""
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(None, -1)
    zpad_shape = list(x.shape)
    zpad_shape[axis] = 1
    z = jnp.zeros(zpad_shape, x.dtype)
    return jnp.concatenate([z, x[tuple(idx)]], axis=axis)


# ---------------------------------------------------------------------------
# Per-axis analysis (dense). axis d: 0 = right neighbor, 1 = down.
# ---------------------------------------------------------------------------

def _analyze_axis(color, rast, pos, tri, op_table, d, instance_mode):
    """Compute per-pixel-pair AA state for one axis.

    Returns dict with (per pixel0 coords [B, H, W]):
      active: bool — pair produced a blend,
      alpha: float — signed blend weight (0 if inactive),
      di: int32 — chosen edge index,
      tri1: bool — chosen triangle is the neighbor pixel's,
      contrib: [B, H, W, C] — alpha * (color1 - color0).
    """
    B, H, W, C = color.shape
    ax = 2 - d  # array axis of the step: x for d=0, y for d=1

    idf0 = rast[..., 3]
    idf1 = _shift_prev(idf0, ax, d)
    z0 = rast[..., 2]
    z1 = _shift_prev(z0, ax, d)

    # Border pairs are clamped to self in the reference (-> no work).
    if d == 0:
        border = jnp.arange(W)[None, None, :] >= W - 1
    else:
        border = jnp.arange(H)[None, :, None] >= H - 1
    work = (idf1 != idf0) & ~border

    tri0 = coord.float_to_triidx(idf0) - 1
    tri1i = coord.float_to_triidx(idf1) - 1

    # Select triangle based on background / depth (antialias.cu:249-257).
    tsel = jnp.where(tri0 >= 0, tri0, tri1i)
    both = (tri0 >= 0) & (tri1i >= 0)
    tsel = jnp.where(both, jnp.where(z0 < z1, tri0, tri1i), tsel)
    is_t1 = tsel == tri1i  # note: work guarantees tri0 != tri1i

    T = tri.shape[0]
    tri_ok = (tsel >= 0) & (tsel < T)
    active = work & tri_ok
    tid = jnp.where(tri_ok, tsel, 0)

    # Pixel coords, possibly shifted to the neighbor (antialias.cu:252-257).
    pxg = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    pyg = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    pxg = jnp.broadcast_to(pxg, (B, H, W))
    pyg = jnp.broadcast_to(pyg, (B, H, W))
    shift = is_t1.astype(jnp.float32)
    px = pxg + shift * (1 - d)
    py = pyg + shift * d

    vi = tri[tid]  # [B, H, W, 3]
    opv = op_table[tid]  # [B, H, W, 3]
    has_op = opv >= 0
    ov = jnp.where(has_op, opv, vi)  # silhouette -> own vertex

    if instance_mode:
        gather = jax.vmap(lambda pb, ib: pb[ib])
        p = gather(pos, vi)  # [B, H, W, 3, 4]
        o = gather(pos, ov)
    else:
        p = pos[vi]
        o = pos[ov]

    xh = 0.5 * W
    yh = 0.5 * H
    fx = px + 0.5 - xh
    fy = py + 0.5 - yh

    def pixspace(q):
        # q: [B, H, W, 3, 4] -> per-vertex pixel-space coords.
        iw = 1.0 / q[..., 3]
        return (q[..., 0] * iw * xh - fx[..., None],
                q[..., 1] * iw * yh - fy[..., None])

    x012, y012 = pixspace(p)  # [B, H, W, 3]
    ox, oy = pixspace(o)
    x0, x1, x2 = x012[..., 0], x012[..., 1], x012[..., 2]
    y0, y1, y2 = y012[..., 0], y012[..., 1], y012[..., 2]
    ox0, ox1, ox2 = ox[..., 0], ox[..., 1], ox[..., 2]
    oy0, oy1, oy2 = oy[..., 0], oy[..., 1], oy[..., 2]

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

    color1 = _shift_prev(color, ax, d)
    contrib = alpha[..., None] * (color1 - color)

    return {
        "active": active & (alpha != 0.0),
        "alpha": alpha,
        "di": di,
        "tri1": is_t1,
        "contrib": contrib,
    }


def _aa_forward_core(color, rast, pos, tri, op_table):
    instance_mode = pos.ndim > 2
    out = color
    states = []
    for d in (0, 1):
        st = _analyze_axis(color, rast, pos, tri, op_table, d, instance_mode)
        ax = 2 - d
        pos_c = jnp.where((st["alpha"] > 0)[..., None], st["contrib"], 0.0)
        neg_c = jnp.where((st["alpha"] <= 0)[..., None], st["contrib"], 0.0)
        out = out + pos_c + _shift_next(neg_c, ax)
        states.append(st)
    # Residual buffers: alpha [B,H,W,2], di [B,H,W,2], tri1 [B,H,W,2].
    alpha = jnp.stack([states[0]["alpha"], states[1]["alpha"]], axis=-1)
    di = jnp.stack([states[0]["di"], states[1]["di"]], axis=-1)
    tri1 = jnp.stack([states[0]["tri1"], states[1]["tri1"]], axis=-1)
    return out, (alpha, di, tri1)


# ---------------------------------------------------------------------------
# Backward (re-derivation of AntialiasGradKernel, antialias.cu:387-556).
# ---------------------------------------------------------------------------

def _aa_backward_axis(dy, color, rast, pos, tri, alpha, di, tri1, d,
                      instance_mode):
    B, H, W, C = color.shape
    ax = 2 - d

    active = alpha != 0.0

    color1 = _shift_prev(color, ax, d)
    dy1 = _shift_prev(dy, ax, d)
    pdy = jnp.where((alpha > 0)[..., None], dy, dy1)

    # Color gradients: -v at pixel0, +v at pixel1 (antialias.cu:449-462).
    v = alpha[..., None] * pdy
    g_color = -v + _shift_next(v, ax)

    # Position gradient weight.
    dd = jnp.sum(pdy * (color1 - color), axis=-1)
    dd = jnp.where(active, dd, 0.0)

    # Chosen triangle: re-read the id from the pixel the forward used.
    idf0 = rast[..., 3]
    idf1 = _shift_prev(idf0, ax, d)
    idf = jnp.where(tri1, idf1, idf0)
    tsel = coord.float_to_triidx(idf) - 1
    T = tri.shape[0]
    ok = active & (tsel >= 0) & (tsel < T) & (dd != 0.0)
    tid = jnp.where(tsel >= 0, tsel, 0)

    # Edge vertices (antialias.cu:470-474).
    i1 = jnp.where(di < 2, di + 1, 0)
    i2 = jnp.where(i1 < 2, i1 + 1, 0)
    vall = tri[tid]  # [B, H, W, 3]
    vi1 = jnp.take_along_axis(vall, i1[..., None], axis=-1)[..., 0]
    vi2 = jnp.take_along_axis(vall, i2[..., None], axis=-1)[..., 0]

    if instance_mode:
        gather = jax.vmap(lambda pb, ib: pb[ib])
        p1 = gather(pos, vi1)
        p2 = gather(pos, vi2)
    else:
        p1 = pos[vi1]
        p2 = pos[vi2]

    pxg = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, None, :],
                           (B, H, W))
    pyg = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None],
                           (B, H, W))
    shift = tri1.astype(jnp.float32)
    px = pxg + shift * (1 - d)
    py = pyg + shift * d

    pxh = 0.5 * W
    pyh = 0.5 * H
    fx = px + 0.5 - pxh
    fy = py + 0.5 - pyh

    p1x, p1y, p1w = p1[..., 0], p1[..., 1], p1[..., 3]
    p2x, p2y, p2w = p2[..., 0], p2[..., 1], p2[..., 3]
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
    zeros = jnp.zeros_like(gp1x)
    g1 = jnp.stack([gp1x, gp1y, zeros, gp1w], axis=-1)
    g2 = jnp.stack([gp2x, gp2y, zeros, gp2w], axis=-1)
    g1 = jnp.where(keep[..., None] & jnp.isfinite(g1), g1, 0.0)
    g2 = jnp.where(keep[..., None] & jnp.isfinite(g2), g2, 0.0)

    return g_color, (vi1, g1), (vi2, g2), keep


def _aa_backward_core(dy, color, rast, pos, tri, residuals):
    alpha, di, tri1 = residuals
    instance_mode = pos.ndim > 2
    B, H, W, C = color.shape
    if instance_mode:
        V = pos.shape[1]
    else:
        V = pos.shape[0]

    g_color = dy
    scatters = []
    for d in (0, 1):
        gc, s1, s2, keep = _aa_backward_axis(
            dy, color, rast, pos, tri, alpha[..., d], di[..., d],
            tri1[..., d], d, instance_mode)
        g_color = g_color + gc
        scatters.append((s1, s2, keep))

    # Deterministic scatter-add of position gradients.
    if instance_mode:
        g_pos = jnp.zeros((B * V, 4), jnp.float32)
        boffs = jnp.arange(B, dtype=jnp.int32)[:, None, None] * V
    else:
        g_pos = jnp.zeros((V, 4), jnp.float32)
        boffs = None

    for (vi1, g1), (vi2, g2), keep in scatters:
        for vi, g in ((vi1, g1), (vi2, g2)):
            if instance_mode:
                idx = vi + boffs
                idx = jnp.where(keep, idx, B * V)
            else:
                idx = jnp.where(keep, vi, V)
            g_pos = g_pos.at[idx.reshape(-1)].add(
                g.reshape(-1, 4), mode="drop")

    if instance_mode:
        g_pos = g_pos.reshape(B, V, 4)
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
    g_color, g_pos = _aa_backward_core(dy, color, rast, pos, tri, res)
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

    if topology_hash is not None:
        assert isinstance(topology_hash, TopologyHashWrapper)
        op_table = topology_hash.op_table
    else:
        op_table = build_opposite_table(tri)

    return _antialias_prim(color, rast, pos, tri, op_table,
                           float(pos_gradient_boost))
