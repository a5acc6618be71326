"""Deterministic high-throughput scatter-add for pixel->table gradients.

The reference accumulates per-pixel gradients into per-vertex/texel
buffers with coalesced float atomics (csrc/common/common.h:198-260) —
fast on GPU but nondeterministic. The TPU-native equivalent maps the
reduction onto the MXU: a chunked one-hot matmul ``onehot(ids).T @
vals`` accumulates in float32 with exact 0/1 weights, is bit-
deterministic, and beats XLA's scatter lowering ~2x at the benchmark
scale. Large tables fall back to XLA scatter-add (also deterministic
on TPU, just slower).
"""

import jax
import jax.numpy as jnp

# One-hot matmul is O(N * R); past this table size the scatter lowering
# wins despite its overhead.
_ONEHOT_MAX_ROWS = 16384
_CHUNK = 1 << 15


def scatter_add_by_id(ids, vals, num_rows, method="auto"):
    """out[r, k] = sum over i with ids[i] == r of vals[i, k].

    Args:
      ids: [N] int32 row ids; out-of-range ids are dropped.
      vals: [N, K] float32.
      num_rows: R, static.
      method: 'auto' | 'onehot' | 'scatter'.

    Returns:
      [R, K] float32.
    """
    N, K = vals.shape
    if method == "auto":
        method = "onehot" if (num_rows <= _ONEHOT_MAX_ROWS
                              and N >= 4 * _CHUNK) else "scatter"

    if method == "scatter":
        safe = jnp.where((ids >= 0) & (ids < num_rows), ids, num_rows)
        return jnp.zeros((num_rows, K), jnp.float32).at[safe].add(
            vals, mode="drop")

    # Chunked one-hot matmul on the MXU (f32 accumulate, deterministic).
    n_chunks = -(-N // _CHUNK)
    Np = n_chunks * _CHUNK
    if Np != N:
        ids = jnp.pad(ids, (0, Np - N), constant_values=-1)
        vals = jnp.pad(vals, ((0, Np - N), (0, 0)))
    row_ids = jnp.arange(num_rows, dtype=ids.dtype)

    def body(i, acc):
        idc = jax.lax.dynamic_slice(ids, (i * _CHUNK,), (_CHUNK,))
        vc = jax.lax.dynamic_slice(vals, (i * _CHUNK, 0), (_CHUNK, K))
        oh = (idc[:, None] == row_ids[None, :]).astype(jnp.float32)
        return acc + jnp.dot(oh.T, vc, preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((num_rows, K), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, acc0)
