"""Microbenchmarks: gather/scatter formulations on the TPU (dev tool).

Decides the data layout for the per-pixel <-> per-triangle transfers
that dominate the op pipeline (gather of triangle tables by pixel id;
scatter-add of pixel gradients into triangle tables).
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N = 2048 * 2048  # pixels
T = 4096         # triangles
K = 16           # floats per triangle record


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt*1e3:9.3f} ms")
    return out


def main():
    key = jax.random.PRNGKey(0)
    tid = jax.random.randint(key, (N,), 0, T, jnp.int32)
    # Spatially-coherent variant (sorted) to test locality effects.
    tid_sorted = jnp.sort(tid)
    table = jax.random.normal(key, (T, K), jnp.float32)
    table_t = table.T  # [K, T]
    g = jax.random.normal(key, (N, 12), jnp.float32)
    g_t = g.T  # [12, N]

    # ---------- gathers ----------
    @jax.jit
    def gather_rows(tid):
        return table[tid]  # [N, K]
    timeit("gather rows [N,16] <- [T,16]", gather_rows, tid)
    timeit("gather rows (sorted ids)", gather_rows, tid_sorted)

    @jax.jit
    def gather_1d(tid):
        return [table_t[k][tid] for k in range(K)]  # K x [N]
    timeit("gather 16 x 1D [N] <- [T]", gather_1d, tid)

    @jax.jit
    def gather_take(tid):
        return jnp.take(table_t, tid, axis=1)  # [K, N]
    timeit("gather axis1 [16,N] <- [16,T]", gather_take, tid)

    @jax.jit
    def gather_onehot(tid):
        # Chunked one-hot matmul on the MXU.
        CH = 1 << 15
        def body(i, acc):
            ids = jax.lax.dynamic_slice(tid, (i * CH,), (CH,))
            oh = (ids[:, None] == jnp.arange(T)[None, :]).astype(jnp.bfloat16)
            r = jnp.dot(oh, table.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(acc, r, (i * CH, 0))
        acc = jnp.zeros((N, K), jnp.float32)
        return jax.lax.fori_loop(0, N // CH, body, acc)
    timeit("gather one-hot matmul bf16", gather_onehot, tid)

    # ---------- scatters (N pixel grads -> T x 12 table) ----------
    @jax.jit
    def scatter_at(tid, g):
        return jnp.zeros((T, 12), jnp.float32).at[tid].add(g)
    timeit("scatter .at[].add [N,12] -> [T,12]", scatter_at, tid, g)
    timeit("scatter .at[].add (sorted ids)", scatter_at, tid_sorted, g)

    @jax.jit
    def scatter_seg(tid, g):
        return jax.ops.segment_sum(g, tid, num_segments=T)
    timeit("scatter segment_sum", scatter_seg, tid, g)

    @jax.jit
    def scatter_1d(tid, g_t):
        return [jnp.zeros((T,), jnp.float32).at[tid].add(g_t[k])
                for k in range(12)]
    timeit("scatter 12 x 1D .at[].add", scatter_1d, tid, g_t)

    @jax.jit
    def scatter_onehot(tid, g):
        CH = 1 << 15
        def body(i, acc):
            ids = jax.lax.dynamic_slice(tid, (i * CH,), (CH,))
            gg = jax.lax.dynamic_slice(g, (i * CH, 0), (CH, 12))
            oh = (ids[:, None] == jnp.arange(T)[None, :]).astype(jnp.bfloat16)
            return acc + jnp.dot(oh.T, gg.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, N // CH, body,
                                 jnp.zeros((T, 12), jnp.float32))
    timeit("scatter one-hot matmul bf16", scatter_onehot, tid, g)

    @jax.jit
    def scatter_sort_seg(tid, g):
        order = jnp.argsort(tid)
        tid_s = tid[order]
        g_s = g[order]
        csum = jnp.cumsum(g_s, axis=0)
        # Segment end positions via searchsorted.
        ends = jnp.searchsorted(tid_s, jnp.arange(T + 1))
        tot = jnp.concatenate([jnp.zeros((1, 12)), csum], axis=0)[ends]
        return jnp.diff(tot, axis=0)
    timeit("scatter sort+cumsum+searchsorted", scatter_sort_seg, tid, g)


if __name__ == "__main__":
    main()
