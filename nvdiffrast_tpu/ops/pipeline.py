"""Fused raster->interpolate->antialias pipeline (TPU extension).

``render_pipeline`` renders the standard 3-op pipeline of the
reference samples (rasterize + interpolate + antialias; e.g.
samples/torch/cube.py:27-32) as TWO Pallas kernels forward and ONE
backward (plus the MXU gradient scatters), instead of the three
independent op families. The standalone ops remain the API for
anything else; this entry exists because the composed step is
overhead-bound on TPU — each op family re-reads the same per-pixel
buffers from HBM with layout glue in between. Reference analog: the L2
kernels all consume the L1 ID buffer directly (csrc/common/
rasterize.cu:29), but the reference still runs them as separate
kernels; fusing them is the TPU-shaped improvement.

Semantics are exactly ``antialias(interpolate(attr, rast, attr_idx)[0],
rast, pos, tri)`` with ``grad_db=False``; gradients flow to ``pos``
(rasterize + antialias paths, with ``pos_gradient_boost`` on the AA
part) and ``attr``. Unsupported configurations transparently fall back
to the composed ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import coord

from .topology import build_opposite_table


def _int_zero_ct(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _use_fused(impl, A, B, T, instance_mode):
    from . import pipeline_pallas as pp

    want = (impl in ("pallas", "pallas_interpret")
            or (impl == "auto" and jax.default_backend() == "tpu"))
    return want and instance_mode and pp.supported(A, B * T)


def _attr_table(attr, atri, instance_mode, B, T):
    """[3A, (B*)T + 1] attribute table (dummy zero column last).

    Broadcast attrs are tiled to B*T rows so the AA/vertex row offsets
    can be shared by every gather in the fused kernels.
    """
    A = attr.shape[-1]
    attr_bc = (not instance_mode) or attr.ndim == 2 or attr.shape[0] == 1
    if instance_mode and not attr_bc:
        att = attr[:, atri]  # [B, T, 3, A]
        tbl = att.reshape(-1, 3 * A).T
    else:
        a2d = attr[0] if attr.ndim == 3 else attr
        tbl = a2d[atri].reshape(-1, 3 * A).T  # [3A, T]
        if B > 1:
            tbl = jnp.tile(tbl, (1, B))
    return jnp.concatenate([tbl, jnp.zeros((3 * A, 1), jnp.float32)],
                           axis=1), attr_bc


def _pipeline_fwd_core(pos, attr, tri, atri, op_table, resolution, impl):
    from . import pipeline_pallas as pp
    from .antialias import _build_tables, _pixel_grid
    from .rasterize_pallas import rasterize_fused

    H, W = resolution
    B = pos.shape[0]
    T = tri.shape[0]
    A = attr.shape[-1]
    N = B * H * W
    interpret = impl == "pallas_interpret"

    ranges = jnp.broadcast_to(jnp.array([[0, T]], jnp.int32), (B, 2))
    u, v, zw, idf, _zbuf = rasterize_fused(
        pos, tri, resolution, ranges, emit_db=False, flat=True,
        interpret=interpret)
    b0f = u.reshape(N)
    b1f = v.reshape(N)
    zwf = zw.reshape(N)
    idff = idf.reshape(N)

    atbl, _ = _attr_table(attr, atri, True, B, T)
    ftable, _btable, _R, _T = _build_tables(pos, tri, op_table, True, H, W)
    fx, fy, rofs, bx, by = _pixel_grid(B, H, W, T, True)
    rofs = rofs if B > 1 else None

    out_cols, c0, res = pp.shade_fwd(
        atbl, ftable, b0f, b1f, zwf, idff, fx, fy, rofs, bx, by,
        A, T, W, interpret=interpret)
    color = out_cols.T.reshape(B, H, W, A)
    return color, (b0f, b1f, idff, c0, res)


def _pipeline_bwd_core(pos, attr, tri, atri, op_table, resolution, impl,
                       boost, saved, dy):
    from . import pipeline_pallas as pp
    from .antialias import _build_tables, _pixel_grid

    (b0f, b1f, idff, c0, res) = saved
    H, W = resolution
    B = pos.shape[0]
    T = tri.shape[0]
    V = pos.shape[1]
    A = attr.shape[-1]
    N = B * H * W
    K = 3 * A
    interpret = impl == "pallas_interpret"

    atbl, attr_bc = _attr_table(attr, atri, True, B, T)
    _ftable, vtbl, R, _T = _build_tables(pos, tri, op_table, True, H, W)
    fx, fy, rofs, bx, by = _pixel_grid(B, H, W, T, True)
    rofs_k = rofs if B > 1 else None

    dy_cols = list(dy.reshape(N, A).T)
    c0_cols = [c0[a] for a in range(A)]

    gs, dd2, rid2 = pp.pipeline_bwd(
        atbl, vtbl, b0f, b1f, idff, fx, fy, rofs_k, bx, by,
        dy_cols, c0_cols, res, A, T, W, H, 2.0 / W, 2.0 / H,
        interpret=interpret)

    # Own-pixel row ids (invalid pixels carry all-zero gradient columns,
    # so routing them to row `rofs` adds exact zeros).
    tid0 = coord.float_to_triidx(idff) - 1
    valid = (tid0 >= 0) & (tid0 < T)
    rid = jnp.where(valid, tid0, 0) + rofs

    # One fused MXU reduction expands the slim streams (bb outer
    # product, AA pair_pos_grad replay) and reduces all gradients.
    (_al0, ax0, _al1, ax1) = res
    gt, gaa = pp.pipeline_grad_scatter(
        rid, gs, dd2, rid2, b0f, b1f, ax0, ax1, vtbl[:, :R], A, R, W, H,
        interpret=interpret)
    ga = gt[:, :K].reshape(B, T, 3, A)
    g9 = gt[:, K:].reshape(B, T, 3, 3)

    # Level 2: triangle rows -> vertex gradients.
    if attr_bc:
        Va = attr.shape[-2]
        g2 = jnp.zeros((Va, A), jnp.float32).at[atri].add(
            ga.sum(axis=0), mode="drop")
        g_attr = g2[None] if attr.ndim == 3 else g2
    else:
        g_attr = jnp.zeros(attr.shape, jnp.float32).at[:, atri].add(
            ga, mode="drop")

    gv = jnp.zeros((B, T, 3, 4), jnp.float32)
    gv = gv.at[..., 0].set(g9[..., 0])
    gv = gv.at[..., 1].set(g9[..., 1])
    gv = gv.at[..., 3].set(g9[..., 2])
    g_pos = jnp.zeros((B, V, 4), jnp.float32).at[:, tri].add(gv, mode="drop")

    # AA position gradients (MXU reduction over both axes' streams).
    gt2 = gaa.reshape(B, T, 3, 3)
    gv2 = jnp.zeros((B, T, 3, 4), jnp.float32)
    gv2 = gv2.at[..., 0].set(gt2[..., 0])
    gv2 = gv2.at[..., 1].set(gt2[..., 1])
    gv2 = gv2.at[..., 3].set(gt2[..., 2])
    g_pos_aa = jnp.zeros((B, V, 4), jnp.float32).at[:, tri].add(
        gv2, mode="drop")
    if boost != 1.0:
        g_pos_aa = g_pos_aa * boost
    return g_pos + g_pos_aa, g_attr


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _pipeline_prim(pos, attr, tri, atri, op_table, resolution, boost, impl):
    color, _ = _pipeline_fwd_core(pos, attr, tri, atri, op_table,
                                  resolution, impl)
    return color


def _pipeline_prim_fwd(pos, attr, tri, atri, op_table, resolution, boost,
                       impl):
    color, saved = _pipeline_fwd_core(pos, attr, tri, atri, op_table,
                                      resolution, impl)
    return color, (pos, attr, tri, atri, op_table, saved)


def _pipeline_prim_bwd(resolution, boost, impl, residuals, dy):
    pos, attr, tri, atri, op_table, saved = residuals
    g_pos, g_attr = _pipeline_bwd_core(
        pos, attr, tri, atri, op_table, resolution, impl, boost, saved, dy)
    return (g_pos, g_attr, _int_zero_ct(tri), _int_zero_ct(atri),
            _int_zero_ct(op_table))


_pipeline_prim.defvjp(_pipeline_prim_fwd, _pipeline_prim_bwd)


def render_pipeline(pos, tri, attr, resolution, attr_idx=None,
                    topology_hash=None, pos_gradient_boost=1.0,
                    impl="auto"):
    """Render the fused rasterize + interpolate + antialias pipeline.

    Equivalent to::

        rast, _ = rasterize(None, pos, tri, resolution, grad_db=False)
        color, _ = interpolate(attr, rast, attr_idx or tri)
        out = antialias(color, rast, pos, tri, topology_hash,
                        pos_gradient_boost)

    but runs as fused Pallas kernels on TPU (see module docstring).
    Falls back to that exact composition when the fused path does not
    apply (range mode, many channels, non-TPU backend).

    Args:
        pos: [minibatch, num_vertices, 4] clip-space positions.
        tri: [num_triangles, 3] int32.
        attr: [minibatch or 1, num_vertices_attr, A] or
            [num_vertices_attr, A] vertex attributes (A <= 8 fused).
        resolution: (height, width).
        attr_idx: triangle tensor for the attribute topology (defaults
            to `tri`; must have the same number of triangles).
        topology_hash: optional TopologyHashWrapper for `tri`.
        pos_gradient_boost: multiplier for the antialias position
            gradients (reference: nvdiffrast/torch/ops.py:484-485).
        impl: 'auto' | 'compose' | 'pallas' | 'pallas_interpret'.

    Returns:
        Antialiased color image [minibatch, height, width, A].
    """
    from .antialias import TopologyHashWrapper

    pos = jnp.asarray(pos, jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    attr = jnp.asarray(attr, jnp.float32)
    atri = tri if attr_idx is None else jnp.asarray(attr_idx, jnp.int32)
    resolution = tuple(int(x) for x in resolution)
    instance_mode = pos.ndim > 2

    if atri.shape[0] != tri.shape[0]:
        raise ValueError(
            f"render_pipeline: attr_idx triangle count {atri.shape[0]} "
            f"must match tri {tri.shape[0]}")

    if topology_hash is not None:
        assert isinstance(topology_hash, TopologyHashWrapper)
        op_table = topology_hash.op_table
    else:
        op_table = build_opposite_table(tri)

    A = attr.shape[-1]
    B = pos.shape[0] if instance_mode else 1
    fused = impl != "compose" and _use_fused(
        impl, A, B, tri.shape[0], instance_mode)
    if not fused:
        from .antialias import antialias
        from .interpolate import interpolate
        from .rasterize import rasterize

        sub = "auto" if impl in ("auto", "compose") else impl
        rast, _ = rasterize(None, pos, tri, resolution, grad_db=False,
                            impl=sub)
        color, _ = interpolate(attr, rast, atri, impl=sub)
        return antialias(color, rast, pos, tri,
                         topology_hash=TopologyHashWrapper(op_table),
                         pos_gradient_boost=pos_gradient_boost, impl=sub)

    with jax.named_scope("nvdiffrast.render_pipeline"):
        return _pipeline_prim(pos, attr, tri, atri, op_table, resolution,
                              float(pos_gradient_boost), impl)
