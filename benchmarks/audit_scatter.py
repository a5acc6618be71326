"""On-chip numerical audit of the bf16 hi/lo MXU scatter (VERDICT r2
item 5).

Two measurements, both on real TPU at production scale:

1. `method='pallas'` (bf16 hi/lo split) vs `method='scatter'` (XLA
   f32 scatter-add) on a rasterizer-shaped gradient stream: 4M pixels
   reducing into an 81k-row table. Reports the max relative error
   against the f32 reference (theory: ~2^-16 per addend, growing as
   sqrt(pixels-per-row) after f32 accumulation).

2. End-to-end finite-difference check of one pipeline gradient ON
   CHIP: d(mean(render_pipeline(...)^2))/d(pos[v]) for a handful of
   vertices via central differences at eps=1e-3, compared against the
   analytic jax.grad. This exercises every custom_vjp + the MXU
   scatters exactly as training does.

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/audit_scatter.py
Document the measured bounds in docs/guide.md.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.scatter import scatter_add_by_id
from nvdiffrast_tpu.ops.pipeline import render_pipeline
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def audit_scatter_methods():
    print("== scatter method agreement (production-scale stream) ==")
    rng = np.random.RandomState(0)
    N = 2048 * 2048
    R = 81920
    K = 9  # rasterize-bwd value width
    # Spatially coherent ids with jitter (rasterized-pixel statistics).
    base = np.sort(rng.randint(0, R, N))
    ids = np.clip(base + rng.randint(-3, 4, N), 0, R - 1).astype(np.int32)
    vals = (rng.randn(K, N) * np.exp(rng.uniform(-3, 3, (1, N))))
    vals = vals.astype(np.float32)

    a = scatter_add_by_id(jnp.asarray(ids), jnp.asarray(vals), R,
                          method="scatter")
    b = scatter_add_by_id(jnp.asarray(ids), jnp.asarray(vals), R,
                          method="pallas")
    a = np.asarray(a)
    b = np.asarray(b)
    denom = np.abs(a) + 1e-3 * float(np.abs(a).max())
    rel = np.abs(b - a) / denom
    print(f"  rows touched: {np.unique(ids).size}, "
          f"max |ref| {np.abs(a).max():.3e}")
    print(f"  max rel err {rel.max():.3e}   "
          f"p99.9 {np.percentile(rel, 99.9):.3e}   "
          f"mean {rel.mean():.3e}")
    return rel.max()


def audit_pipeline_fd():
    """FD + analytic-vs-analytic gradient audit (VERDICT r3 item 6).

    Round-3 measured a 23% worst-case FD-vs-analytic relative error at
    eps=1e-3. Two measurements separate FD discretization noise from
    kernel gradient error:

    1. analytic (fused Pallas pipeline) vs analytic (composed XLA ops)
       over the FULL gradient vector — kernel disagreement shows here
       regardless of coverage discontinuities;
    2. central-difference FD at eps in {1e-2, 3e-3, 1e-3, 3e-4} per
       sampled vertex — true gradient error is eps-stable, while
       AA/coverage discretization noise moves with eps (the loss is
       piecewise-smooth in vertex position: any eps step that shifts a
       silhouette crossing past a pixel-pair center changes coverage
       discretely, which FD sees and the analytic gradient — by design,
       reference antialias.cu:387-556 — does not).
    """
    print("== end-to-end FD check of the pipeline gradient (on chip) ==")
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(16, 32)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos0 = (posw @ mvp.T)[None].astype(np.float32)
    col = jnp.asarray(vtxc)
    RES = 512

    def loss_impl(p, impl):
        img = render_pipeline(p, tri, col, (RES, RES), attr_idx=cidx,
                              impl=impl)
        return jnp.mean(img ** 2)

    loss = jax.jit(lambda p: loss_impl(p, "auto"))
    g = np.asarray(jax.jit(jax.grad(lambda p: loss_impl(p, "auto")))(
        jnp.asarray(pos0)))

    # (1) analytic vs analytic: fused Pallas kernels vs composed XLA
    # custom_vjps on the same loss. Z-fight pixels can hand coverage to
    # a different triangle per path, so compare with a small floor.
    def loss_xla(p):
        from nvdiffrast_tpu.ops.rasterize import rasterize
        from nvdiffrast_tpu.ops.interpolate import interpolate
        from nvdiffrast_tpu.ops.antialias import antialias
        rast, _ = rasterize(None, p, tri, (RES, RES), grad_db=False,
                            impl="xla")
        color, _ = interpolate(col, rast, cidx, impl="xla")
        return jnp.mean(antialias(color, rast, p, tri, impl="xla") ** 2)

    g_x = np.asarray(jax.jit(jax.grad(loss_xla))(jnp.asarray(pos0)))
    denom = np.abs(g_x) + 1e-3 * max(float(np.abs(g_x).max()), 1e-30)
    rel_aa = np.abs(g - g_x) / denom
    print(f"  analytic pallas vs analytic xla (full vector, "
          f"{g.size} entries): max rel {rel_aa.max():.3e}   "
          f"p99.9 {np.percentile(rel_aa, 99.9):.3e}")

    # (2) FD eps sweep at sampled coordinates.
    rng = np.random.RandomState(1)
    worst = 0.0
    gmax = np.abs(g).max()
    eps_list = (1e-2, 3e-3, 1e-3, 3e-4)
    for _ in range(12):
        v = rng.randint(0, pos0.shape[1])
        c = rng.randint(0, 4)
        an = g[0, v, c]
        fds = []
        for eps in eps_list:
            pp = pos0.copy()
            pp[0, v, c] += eps
            lp = float(loss(jnp.asarray(pp)))
            pp[0, v, c] -= 2 * eps
            lm = float(loss(jnp.asarray(pp)))
            fds.append((lp - lm) / (2 * eps))
        err = min(abs(fd - an) / max(abs(fd), abs(an), 1e-3 * gmax)
                  for fd in fds)
        worst = max(worst, err)
        fd_str = " ".join(f"{fd:+.3e}" for fd in fds)
        print(f"  v={v:4d} c={c}  analytic {an:+.6e}  fd[eps sweep] "
              f"{fd_str}  best-rel {err:.3e}")
    print(f"  worst best-over-eps rel {worst:.3e}  "
          f"(eps={eps_list}; eps-dependent spread = coverage "
          f"discretization, not kernel error)")
    return worst, rel_aa.max()


def main():
    print("backend:", jax.default_backend())
    m1 = audit_scatter_methods()
    m2, m3 = audit_pipeline_fd()
    print(f"SUMMARY scatter_rel_max={m1:.3e} pipeline_fd_rel_max={m2:.3e} "
          f"analytic_vs_analytic_rel_max={m3:.3e}")


if __name__ == "__main__":
    main()
