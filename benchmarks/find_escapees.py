"""Search for binning-escape sliver triangles (CSR soundness test data).

Emulates, in vectorized f32 numpy, exactly the arithmetic the fused
rasterizer uses — record coefficients (rasterize._edge_coeffs products)
and the kernel's per-pixel affine evaluation — and hunts for triangles
whose f32 coverage polytope claims a pixel center OUTSIDE the projected
vertex AABB + 0.5 px binning pad (rasterize_pallas._pixel_aabb). Such
triangles reproduce the round-3 on-chip CSR 1-pixel divergence
deterministically; the hits are embedded in
tests/test_parity_sweep.py::test_csr_sliver_exact_ids.

Usage: JAX_PLATFORMS=cpu python benchmarks/find_escapees.py [n_batches]
"""

import sys

import numpy as np

H = W = 256


def coverage_escapes(v):
    """v: [N, 3, 4] f32 clip verts (w > 0). Returns (escape_mask,
    n_escaped_pixels) judged on a grid around each AABB."""
    N = v.shape[0]
    x, y, w = v[..., 0], v[..., 1], v[..., 3]

    def dop(a, b, c, d):
        # rasterize._dop: correctly-rounded f32 difference of exact
        # f64 products (the coefficients the records actually carry).
        return (a.astype(np.float64) * b.astype(np.float64)
                - c.astype(np.float64) * d.astype(np.float64)
                ).astype(np.float32)

    def edge(j, k):
        c0 = dop(x[:, j], y[:, k], x[:, k], y[:, j])
        cx = dop(y[:, j], w[:, k], w[:, j], y[:, k])
        cy = dop(w[:, j], x[:, k], x[:, j], w[:, k])
        return c0, cx, cy

    e = [edge(1, 2), edge(2, 0), edge(0, 1)]
    # Winding normalization: D = a0 at v0.
    D = e[0][0] * w[:, 0] + e[0][1] * x[:, 0] + e[0][2] * y[:, 0]
    po = np.where(D < 0, np.float32(-1), np.float32(1))
    e = [(c0 * po, cx * po, cy * po) for (c0, cx, cy) in e]

    # Projected AABB in pixel units (exactly _pixel_aabb's formula).
    px = (x / w + 1.0) * np.float32(W * 0.5) - np.float32(0.5)
    py = (y / w + 1.0) * np.float32(H * 0.5) - np.float32(0.5)
    bx0, bx1 = px.min(1) - 0.5, px.max(1) + 0.5
    by0, by1 = py.min(1) - 0.5, py.max(1) + 0.5

    # Pixel-center clip fractions like the kernel: fx = col*xs + xo.
    xs = np.float32(2.0 / W)
    xo = np.float32(xs * 0.5 - 1.0)
    ys = np.float32(2.0 / H)
    yo = np.float32(ys * 0.5 - 1.0)

    # Evaluate a G x G pixel grid around each triangle's AABB center.
    G = 24
    cxp = np.clip(((bx0 + bx1) * 0.5).round().astype(np.int64),
                  G // 2, W - G // 2)
    cyp = np.clip(((by0 + by1) * 0.5).round().astype(np.int64),
                  G // 2, H - G // 2)
    gx = cxp[:, None] + (np.arange(G) - G // 2)[None, :]  # [N, G]
    gy = cyp[:, None] + (np.arange(G) - G // 2)[None, :]
    fx = gx.astype(np.float32) * xs + xo  # [N, G]
    fy = gy.astype(np.float32) * ys + yo

    cov = np.ones((N, G, G), bool)
    for (c0, cx, cy) in e:
        a = (c0[:, None, None] + cx[:, None, None] * fx[:, None, :]
             + cy[:, None, None] * fy[:, :, None])  # [N, gy, gx]
        tie = (cy > 0) | ((cy == 0) & (cx > 0))
        cov &= (a > 0) | ((a == 0) & tie[:, None, None])

    # w > 0 and |z| <= w at the pixel (kernel's pw/pz tests).
    zc = np.stack([sum(v[:, i, 2] * e[k][c] for i, k in ((0, 0), (1, 1),
                                                         (2, 2)))
                   for c in range(3)], 1)
    wc = np.stack([sum(v[:, i, 3] * e[k][c] for i, k in ((0, 0), (1, 1),
                                                         (2, 2)))
                   for c in range(3)], 1)
    pw = (wc[:, 0, None, None] + wc[:, 1, None, None] * fx[:, None, :]
          + wc[:, 2, None, None] * fy[:, :, None])
    pz = (zc[:, 0, None, None] + zc[:, 1, None, None] * fx[:, None, :]
          + zc[:, 2, None, None] * fy[:, :, None])
    cov &= (pw > 0) & (np.abs(pz) <= pw)

    inside_box = ((gx[:, None, :] >= np.ceil(bx0)[:, None, None])
                  & (gx[:, None, :] <= np.floor(bx1)[:, None, None])
                  & (gy[:, :, None] >= np.ceil(by0)[:, None, None])
                  & (gy[:, :, None] <= np.floor(by1)[:, None, None]))
    esc = cov & ~inside_box
    return esc.any((1, 2)), esc.sum((1, 2)), cov.sum((1, 2))


def gen(rng, N):
    """Random short slivers, mixed-magnitude clip coords."""
    w = rng.uniform(0.5, 3.0, (N, 1)).astype(np.float32)
    c = rng.uniform(-0.85, 0.85, (N, 2)).astype(np.float32)
    th = rng.uniform(0, np.pi, N).astype(np.float32)
    ln = rng.uniform(2, 30, (N, 1)).astype(np.float32) * (2.0 / W)
    wd = (10.0 ** rng.uniform(-7, -3.2, (N, 1))).astype(np.float32)
    d = np.stack([np.cos(th), np.sin(th)], -1) * ln
    n = np.stack([-np.sin(th), np.cos(th)], -1) * wd
    t = rng.uniform(0.2, 0.8, (N, 1)).astype(np.float32)
    v = np.zeros((N, 3, 4), np.float32)
    v[:, 0, :2] = (c - d) * w
    v[:, 1, :2] = (c + d) * w
    v[:, 2, :2] = (c + (2 * t - 1) * d + n) * w
    v[:, :, 2] = rng.uniform(-0.5, 0.5, (N, 1)) * w
    v[:, :, 3] = w
    return v


def main():
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.RandomState(0)
    hits = []
    tot = 0
    for b in range(batches):
        v = gen(rng, 200000)
        esc, n_esc, n_cov = coverage_escapes(v)
        tot += v.shape[0]
        if esc.any():
            for i in np.nonzero(esc)[0]:
                hits.append((v[i], int(n_esc[i]), int(n_cov[i])))
            # Incremental save: long runs can be killed/timeout.
            np.save("/tmp/escapees.npy", np.stack([h[0] for h in hits]))
            print(f"batch {b}: hit -> {len(hits)} total; verts="
                  f"{v[np.nonzero(esc)[0][0]].tolist()}", flush=True)
        if b % 20 == 0:
            print(f"batch {b}: {tot} tried, {len(hits)} escapees",
                  flush=True)
        if len(hits) >= 48:
            break
    print(f"total: {len(hits)} escapees / {tot}")
    if hits:
        arr = np.stack([h[0] for h in hits])
        np.save("/tmp/escapees.npy", arr)
        print("saved /tmp/escapees.npy", arr.shape)
        for v, ne, nc in hits[:8]:
            print(f"  esc_px={ne} cov_px={nc} verts={v.tolist()}")


if __name__ == "__main__":
    main()
