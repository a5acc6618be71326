"""Differentiable attribute interpolation.

Forward math is an exact re-derivation of
csrc/common/interpolate.cu:15-126 (out = b0*a0 + b1*a1 + (1-b0-b1)*a2,
zeroed where no triangle; optional image-space attribute derivatives
via the chain rule through rast_db).

No hand-written backward is needed on TPU: the reference backward
(csrc/common/interpolate.cu:131-274) is exactly the analytic VJP of
this forward — attribute gradients become a deterministic XLA
scatter-add (vs. nondeterministic float atomics on GPU), bary
gradients land in rast channels 0-1 with channels 2-3 zero, and the
rast_db gradients fall out of the same chain rule. JAX AD reproduces
all of it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import coord

# Maximum number of differentiable attributes (reference:
# csrc/common/interpolate.h:18). We impose no hard limit on TPU but
# keep the constant for API-compatible validation.
MAX_DIFF_ATTRS = 32


def _gather_vertex_attrs(attr, vidx, instance_mode, attr_bc):
    """Gather the three vertex attribute rows per pixel.

    attr: [V, A] (range mode) or [B|1, V, A] (instance mode).
    vidx: [B, H, W, 3] vertex indices.
    """
    if instance_mode and not attr_bc:
        return jax.vmap(lambda ab, vb: ab[vb])(attr, vidx)  # [B, H, W, 3, A]
    a2d = attr[0] if instance_mode else attr
    return a2d[vidx]  # [B, H, W, 3, A]


def interpolate(attr, rast, tri, rast_db=None, diff_attrs=None):
    """Interpolate vertex attributes.

    API parity with the reference op (nvdiffrast/torch/ops.py:241-291).

    Args:
        attr: Attribute tensor, float32. [num_vertices, num_attributes]
            in range mode, or [minibatch_size, num_vertices,
            num_attributes] in instanced mode. Broadcasting is supported
            along the minibatch axis (size-1 leading dim).
        rast: Main output tensor from `rasterize()`.
        tri: Triangle tensor, [num_triangles, 3], int32.
        rast_db: (Optional) second output of `rasterize()` — image-space
            barycentric derivatives. Enables attribute derivatives.
        diff_attrs: (Optional) list of attribute indices for which
            image-space derivatives are computed; 'all' selects every
            attribute. Negative indices are Python-style.

    Returns:
        (out, out_da): out is [minibatch_size, height, width,
        num_attributes]; out_da is [minibatch_size, height, width,
        2 * len(diff_attrs)] with (dA/dX, dA/dY) pairs, or a
        zero-width tensor when `diff_attrs` is not given.
    """
    # Sanitize the list of pixel differential attributes
    # (mirrors nvdiffrast/torch/ops.py:271-280).
    if diff_attrs is None:
        diff_attrs = []
    elif diff_attrs != "all":
        diff_attrs = np.asarray(diff_attrs, np.int32)
        assert len(diff_attrs.shape) == 1
        diff_attrs = diff_attrs.tolist()

    attr = jnp.asarray(attr, jnp.float32)
    rast = jnp.asarray(rast, jnp.float32)
    tri = jnp.asarray(tri, jnp.int32)

    instance_mode = attr.ndim == 3
    A = attr.shape[-1]
    B, H, W, _ = rast.shape
    attr_bc = instance_mode and attr.shape[0] == 1

    if diff_attrs == "all":
        diff_list = list(range(A))
    else:
        # Python-style negative indices (reference: interpolate.cu:101-103).
        diff_list = [int(j) + (A if int(j) < 0 else 0) for j in diff_attrs]
        for j in diff_list:
            if not 0 <= j < A:
                raise ValueError(f"diff_attrs index out of range: {j}")
    enable_da = len(diff_list) > 0
    if enable_da and rast_db is None:
        raise ValueError("diff_attrs requires rast_db")

    tidx = coord.float_to_triidx(rast[..., 3]) - 1
    valid = tidx >= 0
    tid = jnp.where(valid, tidx, 0)
    vidx = tri[tid]  # [B, H, W, 3]

    a = _gather_vertex_attrs(attr, vidx, instance_mode, attr_bc)
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]

    # Barys; force zero where no triangle -> zero output.
    b0 = jnp.where(valid, rast[..., 0], 0.0)[..., None]
    b1 = jnp.where(valid, rast[..., 1], 0.0)[..., None]
    b2 = jnp.where(valid, 1.0 - rast[..., 0] - rast[..., 1], 0.0)[..., None]

    out = b0 * a0 + b1 * a1 + b2 * a2

    if not enable_da:
        return out, jnp.zeros((B, H, W, 0), jnp.float32)

    rast_db = jnp.asarray(rast_db, jnp.float32)
    db = jnp.where(valid[..., None], rast_db, 0.0)
    dudx = db[..., 0:1]
    dudy = db[..., 1:2]
    dvdx = db[..., 2:3]
    dvdy = db[..., 3:4]

    sel = jnp.asarray(diff_list, jnp.int32)
    s0 = a0[..., sel]
    s1 = a1[..., sel]
    s2 = a2[..., sel]
    dsdu = s0 - s2
    dsdv = s1 - s2
    dsdx = dudx * dsdu + dvdx * dsdv
    dsdy = dudy * dsdu + dvdy * dsdv

    # Interleave as (dA/dX, dA/dY) per selected attribute.
    out_da = jnp.stack([dsdx, dsdy], axis=-1).reshape(B, H, W, 2 * len(diff_list))
    return out, out_da
