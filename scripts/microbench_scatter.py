"""Microbench: is TPU scatter-add the near-field bottleneck?

Times three variants of the tree-CSR bucket scan on synthetic data:
  full    — quadrature + scatter (as shipped)
  noscat  — quadrature only, scatter replaced by a sum
  scat    — scatter only, values precomputed
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NNZ = int(os.environ.get('MB_NNZ', 10_500_000))
CHUNK = int(os.environ.get('MB_CHUNK', 8192))
NCH = int(os.environ.get('MB_NCH', 64))
Q = int(os.environ.get('MB_Q', 64))
NPSI = 36


@partial(jax.jit, donate_argnums=(0,))
def scat_only(data, slots, vals):
    def body(Acc, ch):
        s, v = ch
        return Acc.at[s.reshape(-1)].add(v.reshape(-1)), None
    data, _ = jax.lax.scan(body, data, (slots, vals))
    return data


@partial(jax.jit, donate_argnums=(0,))
def scat_flat(data, slots, vals):
    return data.at[slots.reshape(-1)].add(vals.reshape(-1))


@partial(jax.jit, donate_argnums=(0,))
def scat_sorted(data, slots, vals):
    s = slots.reshape(-1)
    v = vals.reshape(-1)
    order = jnp.argsort(s)
    return data.at[s[order]].add(v[order], indices_are_sorted=True)


@partial(jax.jit, donate_argnums=(0,))
def seg_sum(data, slots, vals):
    s = slots.reshape(-1)
    v = vals.reshape(-1)
    return data + jax.ops.segment_sum(v, s, num_segments=NNZ + 1)


@partial(jax.jit, donate_argnums=(0,))
def quad_noscat(data, c1, c2, verts, cells, bx, by, w, PSIP):
    def body(Acc, ch):
        a, b = ch
        v1 = verts[cells[a]]
        v2 = verts[cells[b]]
        x = jnp.einsum('pvd,vq->pqd', v1, bx)
        y = jnp.einsum('pvd,vq->pqd', v2, by)
        r2 = jnp.sum((x - y) ** 2, axis=-1)
        g = r2 ** (-1.75)
        t = g * w[None, :]
        M = t @ PSIP
        return Acc + jnp.sum(M), None
    out, _ = jax.lax.scan(body, data, (c1, c2))
    return out


def timeit(f, *args, n=3):
    r = f(*args)
    jax.block_until_ready(r)
    best = float('inf')
    for _ in range(n):
        args = (r,) + args[1:] if hasattr(args[0], 'shape') else args
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f'device={dev.platform} NNZ={NNZ} CHUNK={CHUNK} NCH={NCH} Q={Q}',
          flush=True)
    nUpd = NCH * CHUNK * NPSI
    slots = jnp.asarray(rng.integers(0, NNZ, size=(NCH, CHUNK, NPSI)),
                        dtype=jnp.int32)
    vals = jnp.asarray(rng.normal(size=(NCH, CHUNK, NPSI)).astype(np.float32))
    data = jnp.zeros(NNZ + 1, dtype=jnp.float32)
    t, data = timeit(scat_only, data, slots, vals)
    print(f'scan-scatter : {t:8.3f}s  {nUpd/t/1e6:9.1f}M upd/s', flush=True)
    t, data = timeit(scat_flat, data, slots, vals)
    print(f'flat-scatter : {t:8.3f}s  {nUpd/t/1e6:9.1f}M upd/s', flush=True)
    t, data = timeit(scat_sorted, data, slots, vals)
    print(f'sort+scatter : {t:8.3f}s  {nUpd/t/1e6:9.1f}M upd/s', flush=True)
    t, data = timeit(seg_sum, data, slots, vals)
    print(f'segment_sum  : {t:8.3f}s  {nUpd/t/1e6:9.1f}M upd/s', flush=True)

    # quadrature-only
    nV = 20000
    verts = jnp.asarray(rng.normal(size=(nV, 2)).astype(np.float32))
    cells = jnp.asarray(rng.integers(0, nV, size=(40000, 3)), dtype=jnp.int32)
    c1 = jnp.asarray(rng.integers(0, 40000, size=(NCH, CHUNK)),
                     dtype=jnp.int32)
    c2 = jnp.asarray(rng.integers(0, 40000, size=(NCH, CHUNK)),
                     dtype=jnp.int32)
    bx = jnp.asarray(rng.random(size=(3, Q)).astype(np.float32))
    by = jnp.asarray(rng.random(size=(3, Q)).astype(np.float32))
    w = jnp.asarray(rng.random(size=(Q,)).astype(np.float32))
    PSIP = jnp.asarray(rng.random(size=(Q, NPSI)).astype(np.float32))
    acc0 = jnp.zeros((), dtype=jnp.float32)
    t, _ = timeit(quad_noscat, acc0, c1, c2, verts, cells, bx, by, w, PSIP)
    nP = NCH * CHUNK
    print(f'quad-noscat  : {t:8.3f}s  {nP/t/1e6:9.1f}M pairs/s', flush=True)


if __name__ == '__main__':
    main()
