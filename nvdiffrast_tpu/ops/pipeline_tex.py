"""Fused textured render pipeline (TPU extension).

``render_pipeline_textured`` renders the reference's textured workload
(earth.py / envphong.py shape: rasterize(grad_db) + interpolate(uv,
diff_attrs='all') + texture(mip) + antialias, e.g.
samples/torch/earth.py:44-61) with every inter-op boundary carried as
FLAT channel-major buffers:

* no NHWC interleave of rast/rast_db and no re-flattening per op —
  the rasterizer's flat channels feed interpolate/antialias directly;
* no [N, 2]/[N, 4] uv/uv_da images between interpolate and texture —
  exactly the tiny-trailing-dim layouts the TPU tile-pads by 32-64x
  in HBM (see scatter.py's layout rule);
* the only NHWC tensor materialized is the final antialiased image.

Semantics are exactly::

    rast, rast_db = rasterize(ctx, pos, tri, res, grad_db=True)
    uv, uv_da = interpolate(uv_attr, rast, uv_tri, rast_db,
                            diff_attrs='all')
    color = texture(tex, uv, uv_da=uv_da, filter_mode=..., ...)
    out = antialias(color, rast, pos, tri)

with gradients to ``pos``, ``uv_attr`` and ``tex``. Unsupported
configurations transparently fall back to that composed-op chain.

Each stage keeps its own custom_vjp (rasterize_flat /
interpolate_flat / sample_fused / antialias_flat) and the glue is
plain differentiable JAX, so JAX AD chains the hand-written backwards
without a pipeline-level vjp.
"""

import jax
import jax.numpy as jnp


def render_pipeline_textured(pos, tri, uv_attr, tex, resolution,
                             uv_tri=None, filter_mode="linear-mipmap-linear",
                             boundary_mode="wrap", max_mip_level=-1,
                             pos_gradient_boost=1.0, topology_hash=None,
                             impl="auto"):
    """Fused rasterize + uv-interpolate + texture + antialias.

    Args:
      pos: [B, V, 4] clip-space positions (instance mode only).
      tri: [T, 3] int32.
      uv_attr: [Vu, 2] (or [1, Vu, 2]) texture coordinates — or
        [Vu, 3] direction vectors for boundary_mode='cube'.
      tex: [D, th, tw, C] texture, or [D, 6, fw, fw, C] cube map
        (D == 1 or B).
      resolution: (H, W).
      uv_tri: [T, 3] int32 uv indices (defaults to `tri`).
      filter_mode / boundary_mode / max_mip_level: as in `texture`.
      pos_gradient_boost: antialias position-gradient multiplier.
      topology_hash: optional `TopologyHashWrapper` (from
        `antialias_construct_topology_hash`) so a static mesh's
        opposite-vertex table is not rebuilt every step.
      impl: 'auto' | 'pallas' | 'pallas_interpret' | 'xla' ('xla'
        always takes the composed fallback).

    Returns:
      [B, H, W, C] antialiased textured image.
    """
    from . import antialias_pallas as ap
    from . import interpolate_pallas as ip
    from . import texture_pallas as tp
    from .antialias import TopologyHashWrapper, antialias, antialias_flat
    from .interpolate import interpolate, interpolate_flat
    from .rasterize import _check_rasterize_args, rasterize, rasterize_flat
    from .texture import (_cube_faceid, _cube_project, _cube_st_da_cols,
                          _mip_level_from_footprint_cols, _pack_pyramid,
                          _static_meta, build_mip_stack, dispatch_fused_cols,
                          texture)
    from .topology import build_opposite_table

    pos = jnp.asarray(pos, jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)
    uv_attr = jnp.asarray(uv_attr, jnp.float32)
    tex = jnp.asarray(tex, jnp.float32)
    if uv_tri is None:
        uv_tri = tri
    else:
        uv_tri = jnp.asarray(uv_tri, jnp.int32)

    # Same loud input validation as the standalone rasterize op (the
    # fused path must not silently clamp bad indices or >2^24 meshes).
    _check_rasterize_args(pos, tri, resolution, None)

    H, W = resolution
    instance_mode = pos.ndim == 3
    B = pos.shape[0] if instance_mode else 0
    T = tri.shape[0]
    N = B * H * W
    C = tex.shape[-1]
    D = tex.shape[0]
    cube_mode = boundary_mode == "cube"
    A = 3 if cube_mode else 2

    # Shared mip pyramid (differentiable; gradients pull back to tex).
    use_mip = "mipmap" in filter_mode
    levels = [tex] + (build_mip_stack(tex, max_mip_level, cube_mode)
                      if use_mip else [])
    smeta, n_texels = _static_meta(levels)
    L = len(levels)

    want = (impl in ("pallas", "pallas_interpret")
            or (impl == "auto" and jax.default_backend() == "tpu"))
    fused_ok = (
        want and instance_mode and tex.ndim == (5 if cube_mode else 4)
        and uv_attr.shape[-1] == A
        and (uv_attr.ndim == 2 or uv_attr.shape[0] == 1)
        and D in (1, B)
        and filter_mode in ("linear", "linear-mipmap-nearest",
                            "linear-mipmap-linear")
        and tp.supported(C, n_texels, N, cube_mode, boundary_mode,
                         force=True, meta=smeta, L=L)
        and ip.supported(A, T, N, force=True)
        and ap.supported(C, B * T))

    if not fused_ok:
        rast, rast_db = rasterize(None, pos, tri, resolution,
                                  grad_db=use_mip, impl=impl)
        uv, uv_da = interpolate(uv_attr, rast, uv_tri, rast_db,
                                diff_attrs="all" if use_mip else None,
                                impl=impl)
        img = texture(tex, uv, uv_da=uv_da if use_mip else None,
                      filter_mode=filter_mode,
                      boundary_mode=boundary_mode,
                      max_mip_level=max_mip_level, impl=impl)
        return antialias(img, rast, pos, tri,
                         topology_hash=topology_hash,
                         pos_gradient_boost=pos_gradient_boost, impl=impl)

    # ---- fused flat chain ----
    # No-mip filtering needs no pixel differentials: skip the db
    # accumulator channels in the raster kernel and the da columns in
    # the interp kernel entirely.
    if use_mip:
        u, v, zw, idf, d0, d1, d2, d3 = rasterize_flat(
            pos, tri, resolution, impl, True)
        db01 = jnp.stack([d0, d1])
        db23 = jnp.stack([d2, d3])
        diff_list = tuple(range(A))
    else:
        u, v, zw, idf = rasterize_flat(pos, tri, resolution, impl, False)
        db01 = db23 = jnp.zeros((2, N), jnp.float32)
        diff_list = ()
    uv_cm, da_cm = interpolate_flat(
        uv_attr, u, v, idf, uv_tri, db01, db23, diff_list, impl)

    tex_w = jnp.float32(tex.shape[-2])
    tex_h = jnp.float32(tex.shape[-3])
    flat, _meta = _pack_pyramid(levels, cube_mode)
    if D == 1:
        tz = jnp.zeros((N,), jnp.int32)
    else:
        tz = jnp.arange(N, dtype=jnp.int32) // (H * W)

    cube_cols = None
    u_col = v_col = None
    if cube_mode:
        finfo = _cube_faceid(uv_cm[0], uv_cm[1], uv_cm[2])
        sc, tc, finite = _cube_project(finfo, uv_cm[0], uv_cm[1],
                                       uv_cm[2])
        cube_cols = (sc, tc, finite, finfo[0])
        if use_mip:
            st4 = _cube_st_da_cols(uv_cm[0], uv_cm[1], uv_cm[2],
                                   [da_cm[i] for i in range(6)])
            flevel = jnp.clip(
                _mip_level_from_footprint_cols(*st4, tex_w, tex_h),
                0.0, float(L - 1))
        else:
            flevel = jnp.zeros((N,), jnp.float32)
    else:
        u_col, v_col = uv_cm[0], uv_cm[1]
        if use_mip:
            flevel = jnp.clip(
                _mip_level_from_footprint_cols(
                    da_cm[0], da_cm[1], da_cm[2], da_cm[3], tex_w, tex_h),
                0.0, float(L - 1))
        else:
            flevel = jnp.zeros((N,), jnp.float32)
    out_cm = dispatch_fused_cols(
        flat, smeta, levels, cube_mode, u_col, v_col, flevel, tz,
        boundary_mode, filter_mode, (B, H, W),
        impl == "pallas_interpret", cube_cols)

    if topology_hash is not None:
        assert isinstance(topology_hash, TopologyHashWrapper)
        op_table = topology_hash.op_table
    else:
        op_table = build_opposite_table(tri)
    return antialias_flat(out_cm, idf, zw, pos, tri, op_table,
                          (B, H, W, C), pos_gradient_boost, impl)
