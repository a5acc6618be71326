"""Diagnose the 1.05M-tri CSR-vs-remap coverage divergence (VERDICT r3 #2).

Renders the smoke_paths 1.05M-tri sphere at 2048**2 through both the
remap and (budget-forced) CSR kernel paths, locates every divergent
pixel, and re-derives — on the host, from the same device-computed
records — where the remap-path winner went in the CSR layout:

  * its screen AABB and segment classification (local / band / global),
  * whether the divergent pixel lies inside that AABB,
  * which layout slot/block the record landed in,
  * whether that block is reachable from the pixel's tile via the
    (cstart, ccnt) walk the kernel performs,
  * the group AABB covering that slot vs the pixel.

Prints a verdict line per divergent pixel.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops import rasterize_pallas as rp
from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def sphere_scene(nlat, nlon):
    pos_idx, vtxp, _, _ = primitives.uv_sphere(nlat, nlon)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    return pos, jnp.asarray(pos_idx)


def render(pos, tri, res, budget):
    saved = rp._REMAP_MAX_ENTRIES
    rp._REMAP_MAX_ENTRIES = budget
    try:
        r, _ = jax.jit(lambda p: rasterize(None, p, tri, res,
                                           impl="pallas"))(pos)
        r = np.asarray(r)
    finally:
        rp._REMAP_MAX_ENTRIES = saved
    return r


def main():
    print("backend:", jax.default_backend())
    H = W = 2048
    pos, tri = sphere_scene(512, 1024)
    T = int(tri.shape[0])

    r_remap = render(pos, tri, (H, W), 1 << 30)
    r_csr = render(pos, tri, (H, W), 0)

    ids_r = r_remap[0, ..., 3]
    ids_c = r_csr[0, ..., 3]
    differ = ids_r != ids_c
    ys, xs = np.nonzero(differ)
    print(f"divergent pixels: {len(ys)}")
    if not len(ys):
        print("no divergence this run")
        return

    # --- re-derive the CSR layout from the same device-side records ---
    nty = -(-H // rp.TILE_H)
    wp0 = -(-W // rp.LANE) * rp.LANE
    ntx = -(-wp0 // rp.MAX_TILE_W)
    tile_w = rp.LANE * (-(-(wp0 // rp.LANE) // ntx))
    target = -(-T // 64)
    chunk = min(rp.CHUNK_CAP, max(rp.MAX_CHUNK, -(-target // 64) * 64),
                -(-T // (8 * rp.GROUP)) * 8 * rp.GROUP)
    print(f"nty={nty} ntx={ntx} tile_w={tile_w} chunk={chunk}")

    def layout(pos, tri):
        tri_ids = jnp.arange(T, dtype=jnp.int32)
        rec_cm, clipc, valid, slop = rp._build_records_cm(pos[0], tri,
                                                          tri_ids)
        sx, sy, sw, sv = clipc
        aabb = rp._aabb_union_cols(sx, sy, sw, sv, valid, slop, H, W, 0, H)
        rec_l, gaabb, cstart, ccnt = rp._csr_layout(
            rec_cm, aabb, nty, ntx, tile_w, chunk)
        return aabb, rec_l, gaabb, cstart, ccnt

    aabb, rec_l, gaabb, cstart, ccnt = jax.jit(layout)(pos, tri)
    xmin, ymin, xmax, ymax, ok = [np.asarray(a) for a in aabb]
    # rec_l is lane-packed [S_pad/GROUP, GROUP*16]: unpack idf (f=15).
    rec_idf = np.asarray(rec_l).reshape(-1, rp.GROUP, 16)[..., 15].ravel()
    gaabb = np.asarray(gaabb)
    cstart = np.asarray(cstart)
    ccnt = np.asarray(ccnt)
    nk0 = nty * ntx

    for y, x in list(zip(ys, xs))[:8]:
        idr, idc = ids_r[y, x], ids_c[y, x]
        zr, zc = r_remap[0, y, x, 2], r_csr[0, y, x, 2]
        print(f"pixel ({y},{x}): remap id={idr:.0f} z={zr:+.6f}  "
              f"csr id={idc:.0f} z={zc:+.6f}")
        # The record the csr path is missing (or mis-placing): whichever
        # side has the nearer hit.
        for name, idv in (("remap-winner", idr), ("csr-winner", idc)):
            if idv <= 0:
                continue
            t = int(idv) - 1
            x0, y0, x1, y1 = xmin[t], ymin[t], xmax[t], ymax[t]
            in_box = (x0 <= x <= x1) and (y0 <= y <= y1)
            band0 = int(np.clip(np.floor((y0 + 0.5) / rp.TILE_H), 0,
                                nty - 1))
            band1 = int(np.clip(np.floor((y1 + 0.5) / rp.TILE_H), 0,
                                nty - 1))
            tx0 = int(np.clip(np.floor((x0 + 0.5) / tile_w), 0, ntx - 1))
            tx1 = int(np.clip(np.floor((x1 + 0.5) / tile_w), 0, ntx - 1))
            local = band0 == band1 and tx0 == tx1
            bandonly = band0 == band1 and not local
            key = (band0 * ntx + tx0 if local
                   else nk0 + band0 if bandonly else nk0 + nty)
            kind = "local" if local else "band" if bandonly else "global"
            pty, ptx = y // rp.TILE_H, x // tile_w
            pseg = pty * ntx + ptx
            slots = np.nonzero(rec_idf == float(t + 1))[0]
            print(f"  {name} t={t}: ok={ok[t]} box=({x0:.2f},{y0:.2f})-"
                  f"({x1:.2f},{y1:.2f}) pixel-in-box={in_box}")
            print(f"    seg: kind={kind} key={key}  pixel tile=({pty},{ptx})"
                  f" seg {pseg} band {nk0 + pty} glob {nk0 + nty}")
            print(f"    layout slots: {slots}")
            for j in slots:
                blk = int(j) // chunk
                reach = []
                for kk, lbl in ((pseg, "local"), (nk0 + pty, "band"),
                                (nk0 + nty, "global")):
                    if cstart[kk] <= blk < cstart[kk] + ccnt[kk]:
                        reach.append(lbl)
                g = int(j) // rp.GROUP
                gx0, gy0, gx1, gy1 = gaabb[g]
                gin = (gx0 <= x <= gx1) and (gy0 <= y <= gy1)
                print(f"    slot {j} block {blk} reachable-via={reach} "
                      f"gaabb=({gx0:.2f},{gy0:.2f})-({gx1:.2f},{gy1:.2f}) "
                      f"pixel-in-gaabb={gin}")
    print("done")


if __name__ == "__main__":
    main()
