"""Break down _csr_layout's tail (the 80 ms of the 105 ms 1M-tri
binning prepass measured in round 5's first gate pass — records build
itself is now 13.7 ms after the channel-major rewrite).

Cumulative stages on the real 1.05M-tri sphere:

  order     — keys + single-key sort (baseline)
  slotmap   — + counts / cstart / block cummax / src slot mapping
  gather16  — + the [16, S_pad] laid-out record gather
  pack      — + _pack_records lane interleave
  gaabb     — + the 4 AABB gathers and group min/max
  full      — _csr_layout as shipped

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_csrtail.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure

from nvdiffrast_tpu.ops import rasterize_pallas as rp
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera


def timeit(fn, args_list):
    def step(*a):
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return (leaf.ravel()[:1],)
    return _measure(jax.jit(step), args_list)


def main():
    print("backend:", jax.default_backend(), flush=True)
    H = W = 2048
    pos_idx, vtxp, _, _ = primitives.uv_sphere(512, 1024)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos0 = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    tri = jnp.asarray(pos_idx)
    T = int(tri.shape[0])
    poss = [pos0 * jnp.float32(1.0 + i * 1e-6) for i in range(3)]

    nty = -(-H // rp.TILE_H)
    wp0 = -(-W // rp.LANE) * rp.LANE
    ntx = -(-wp0 // rp.MAX_TILE_W)
    tile_w = rp.LANE * (-(-(wp0 // rp.LANE) // ntx))
    target = -(-T // 64)
    chunk = min(rp.CHUNK_CAP, max(rp.MAX_CHUNK, -(-target // 64) * 64),
                -(-T // (8 * rp.GROUP)) * 8 * rp.GROUP)
    print(f"T={T} nty={nty} ntx={ntx} tile_w={tile_w} chunk={chunk}",
          flush=True)
    tri_ids = jnp.arange(T, dtype=jnp.int32)

    def prep(pos):
        rec_cm, clipc, valid, slop = rp._build_records_cm(pos[0], tri,
                                                          tri_ids)
        sx, sy, sw, sv = clipc
        aabb = rp._aabb_union_cols(sx, sy, sw, sv, valid, slop, H, W, 0, H)
        return rec_cm, aabb

    _cdiv = rp._cdiv

    def tail(pos, upto):
        rec_cm, aabb = prep(pos)
        xmin, ymin, xmax, ymax, ok = aabb
        S = rec_cm.shape[-1]

        def tix(v, n, scale):
            return jnp.clip(jnp.floor((v + 0.5) / scale).astype(jnp.int32),
                            0, n - 1)

        band0 = tix(ymin, nty, rp.TILE_H)
        band1 = tix(ymax, nty, rp.TILE_H)
        tx0 = tix(xmin, ntx, tile_w)
        tx1 = tix(xmax, ntx, tile_w)
        nk0 = nty * ntx
        n_seg = nk0 + nty + 1
        local = (band0 == band1) & (tx0 == tx1)
        bandonly = (band0 == band1) & ~local
        key = jnp.where(local, band0 * ntx + tx0,
                        jnp.where(bandonly, nk0 + band0, nk0 + nty))
        key = jnp.where(ok, key, n_seg)
        order, _ = rp._stable_order(key, n_seg)
        if upto == "order":
            return order

        counts = jnp.zeros((n_seg,), jnp.int32).at[
            jnp.clip(key, 0, n_seg - 1)].add(ok.astype(jnp.int32))
        ccnt = -(-counts // chunk)
        cstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(ccnt)])
        seg0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(counts)])
        S_pad = (_cdiv(S, chunk) + n_seg) * chunk
        nb = S_pad // chunk
        k_blk = jax.lax.cummax(
            jnp.full((nb,), -1, jnp.int32).at[cstart].max(
                jnp.arange(n_seg + 1, dtype=jnp.int32), mode="drop"))
        kc_blk = jnp.clip(k_blk, 0, n_seg - 1)
        r0_blk = (jnp.arange(nb, dtype=jnp.int32) - cstart[kc_blk]) * chunk
        valid_blk = k_blk < n_seg

        def expand(a_blk):
            return jnp.broadcast_to(a_blk[:, None], (nb, chunk)).reshape(-1)

        jr = jnp.arange(S_pad, dtype=jnp.int32) % chunk
        r = expand(r0_blk) + jr
        valid_slot = expand(valid_blk) & (r < expand(counts[kc_blk]))
        src = order[jnp.clip(expand(seg0[kc_blk]) + r, 0, S - 1)]
        if upto == "slotmap":
            return src

        safe_cm = jnp.zeros((16, 1), jnp.float32).at[15, 0].set(
            rp._ID_INVALID)
        rec_l = jnp.where(valid_slot[None, :], rec_cm[:, src], safe_cm)
        if upto == "gather16":
            return rec_l

        packed = rp._pack_records(rec_l)
        if upto == "pack":
            return packed

        gx0 = jnp.where(valid_slot, xmin[src], rp._BIG)
        gy0 = jnp.where(valid_slot, ymin[src], rp._BIG)
        gx1 = jnp.where(valid_slot, xmax[src], -rp._BIG)
        gy1 = jnp.where(valid_slot, ymax[src], -rp._BIG)
        ng = S_pad // rp.GROUP

        def greduce(v, red):
            return red(v.reshape(ng, rp.GROUP), axis=1)

        gaabb = jnp.stack([
            greduce(gx0, jnp.min), greduce(gy0, jnp.min),
            greduce(gx1, jnp.max), greduce(gy1, jnp.max)], axis=-1)
        return packed, gaabb

    def full(pos):
        rec_cm, aabb = prep(pos)
        return rp._csr_layout(rec_cm, aabb, nty, ntx, tile_w, chunk)

    stages = [("order", lambda p: tail(p, "order")),
              ("slotmap", lambda p: tail(p, "slotmap")),
              ("gather16", lambda p: tail(p, "gather16")),
              ("pack", lambda p: tail(p, "pack")),
              ("gaabb", lambda p: tail(p, "gaabb")),
              ("full", full)]
    for name, fn in stages:
        dt = timeit(fn, [(p,) for p in poss])
        print(f"{name:10s} {dt * 1e3:8.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
