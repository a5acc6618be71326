"""Deterministic high-throughput scatter-add for pixel->table gradients.

The reference accumulates per-pixel gradients into per-vertex/texel
buffers with coalesced float atomics (csrc/common/common.h:198-260) —
fast on GPU but nondeterministic. The TPU-native equivalent maps the
reduction onto the MXU: a chunked one-hot matmul accumulates in
float32 with exact 0/1 weights, is bit-deterministic, and beats XLA's
scatter lowering ~2x at the benchmark scale. Large tables fall back to
XLA scatter-add (also deterministic on TPU, just slower).

Layout rule: per-pixel values travel CHANNEL-MAJOR ([K, N], pixel axis
minormost). A [N, K] array with K < 128 is lane-padded to 128 in both
VMEM and HBM on TPU — a 4M-pixel [N, 9] buffer would silently cost
2 GB. [K, N] only pads K up to the sublane multiple (8).
"""

import jax
import jax.numpy as jnp

# One-hot matmul is O(N * R); past this table size the scatter lowering
# wins despite its overhead.
_ONEHOT_MAX_ROWS = 16384
_CHUNK = 1 << 15


def scatter_add_by_id(ids, vals_t, num_rows, method="auto"):
    """out[r, k] = sum over i with ids[i] == r of vals_t[k, i].

    Args:
      ids: [N] int32 row ids; out-of-range ids are dropped.
      vals_t: [K, N] float32, channel-major.
      num_rows: R, static.
      method: 'auto' | 'onehot' | 'scatter'.

    Returns:
      [R, K] float32.
    """
    K, N = vals_t.shape
    if method == "auto":
        method = "onehot" if (num_rows <= _ONEHOT_MAX_ROWS
                              and N >= 4 * _CHUNK) else "scatter"

    if method == "scatter":
        safe = jnp.where((ids >= 0) & (ids < num_rows), ids, num_rows)
        return jnp.zeros((num_rows, K), jnp.float32).at[safe].add(
            vals_t.T, mode="drop")

    # Chunked one-hot matmul on the MXU (f32 accumulate, deterministic).
    # Row folding: with raw K lanes the MXU runs at K/128 utilization, so
    # F=8 consecutive table rows are packed into the lane dimension
    # (out[q, f*K+k] for row q*F+f) — 8x fewer one-hot columns and ~56%
    # lane utilization, at the cost of F-expanded value traffic.
    F = 1
    while (F * 2 * K <= 128) and (F < 8):
        F *= 2
    Rf = -(-num_rows // F) * F
    QR = Rf // F

    n_chunks = -(-N // _CHUNK)
    Np = n_chunks * _CHUNK
    if Np != N:
        ids = jnp.pad(ids, (0, Np - N), constant_values=-1)
        vals_t = jnp.pad(vals_t, ((0, 0), (0, Np - N)))
    # Out-of-range ids -> an id whose q is out of range (dropped).
    ids = jnp.where((ids >= 0) & (ids < num_rows), ids, Rf)
    row_ids = jnp.arange(QR, dtype=ids.dtype)

    def body(i, acc):
        idc = jax.lax.dynamic_slice(ids, (i * _CHUNK,), (_CHUNK,))
        vc = jax.lax.dynamic_slice(vals_t, (0, i * _CHUNK), (K, _CHUNK))
        q = idc // F
        s = idc % F
        oh = (q[:, None] == row_ids[None, :]).astype(jnp.float32)
        if F > 1:
            vc = jnp.concatenate(
                [jnp.where(s[None, :] == f, vc, 0.0) for f in range(F)],
                axis=0)  # [F*K, CHUNK]
        # out[qr, fk] = sum_p oh[p, qr] * vc[fk, p]
        return acc + jax.lax.dot_general(
            oh, vc, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((QR, F * K), jnp.float32)
    out = jax.lax.fori_loop(0, n_chunks, body, acc0)
    return out.reshape(Rf, K)[:num_rows]
