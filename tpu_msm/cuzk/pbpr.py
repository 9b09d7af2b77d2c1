"""Pipeline stages 4+5a: parallel bucket-points reduction (PBPR).

Analogue of shader/cuzk/pbpr.metal (bpr_stage_1 :33-96, bpr_stage_2
:98-148) — cuZK Alg.4's m/g split: each of T slices of Bt consecutive
buckets computes a running sum m (slice total) and a locally-weighted sum
g; slice totals are then combined with their slice offsets.

With bucket b (0-based) holding multiplier (b+1) and b = t*Bt + j:

    sum_b (b+1) * S_b  =  sum_t g_t  +  Bt * sum_{k=1}^{T-1} M_k

where g_t = sum_j (j+1) * S_{t,j}, m_t = sum_j S_{t,j} and
M_k = sum_{t>=k} m_t. The reference's stage 2 multiplies each m_t by its
scalar offset with a 32-bit double-and-add (pbpr.metal:16-31); the suffix
identity above removes the scalar multiplication entirely — the offset
weights become one suffix accumulation over T plus log2(Bt) doublings of
a single point batch. Everything is fixed-shape: two fori_loops (Bt and
T-1 steps) and a static halving tree, all on complete projective adds
(empty buckets are (0:1:0) and need no masking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MSMConfig
from ..ops.complete import ProjPoint, padd, pdbl, proj_infinity


def _dyn(arr, i):
    return jax.lax.dynamic_index_in_dim(arr, i, axis=0, keepdims=False)


def bucket_reduce(buckets: ProjPoint, cfg: MSMConfig) -> ProjPoint:
    """Reduce per-window bucket arrays to per-window sums.

    buckets: ProjPoint with batch (W, B), slot b = multiplier b+1.
    Returns ProjPoint with batch (W,): G_w = sum_b (b+1) * S_{w,b}.
    """
    curve = cfg.curve
    L = curve.num_limbs
    W, B = buckets.x.shape[1:]
    T = min(cfg.pbpr_threads, B)
    Bt = B // T
    if T * Bt != B:
        raise ValueError("pbpr_threads must divide the bucket count")

    # (L, W, B) -> (Bt, L, W, T): slice t owns buckets [t*Bt, (t+1)*Bt)
    def to_slices(a):
        return jnp.moveaxis(a.reshape(L, W, T, Bt), -1, 0)

    sx, sy, sz = map(to_slices, buckets)

    def stage1(j, state):
        m, g = state
        idx = Bt - 1 - j  # walk each slice from its top bucket down
        pt = ProjPoint(_dyn(sx, idx), _dyn(sy, idx), _dyn(sz, idx))
        m = padd(m, pt, curve, unroll=cfg.unroll_resolved)
        g = padd(g, m, curve, unroll=cfg.unroll_resolved)
        return m, g

    m0 = proj_infinity(curve, (W, T))
    m, g = jax.lax.fori_loop(0, Bt, stage1, (m0, m0))

    # g_total = sum_t g_t  (static halving tree over the T axis)
    t = T
    while t > 1:
        g = padd(ProjPoint(g.x[..., : t // 2], g.y[..., : t // 2],
                           g.z[..., : t // 2]),
                 ProjPoint(g.x[..., t // 2 : t], g.y[..., t // 2 : t],
                           g.z[..., t // 2 : t]),
                 curve, unroll=False)
        t //= 2
    g_total = ProjPoint(g.x[..., 0], g.y[..., 0], g.z[..., 0])  # (L, W)

    # offset part: Bt * sum_{k=1}^{T-1} M_k, M_k = suffix sums of m
    mx = jnp.moveaxis(m.x, -1, 0)  # (T, L, W)
    my = jnp.moveaxis(m.y, -1, 0)
    mz = jnp.moveaxis(m.z, -1, 0)

    def stage2(j, state):
        macc, msum = state
        idx = T - 1 - j  # k runs T-1 .. 1
        pt = ProjPoint(_dyn(mx, idx), _dyn(my, idx), _dyn(mz, idx))
        macc = padd(macc, pt, curve, unroll=False)
        msum = padd(msum, macc, curve, unroll=False)
        return macc, msum

    inf_w = proj_infinity(curve, (W,))
    _, msum = jax.lax.fori_loop(0, T - 1, stage2, (inf_w, inf_w))

    for _ in range(Bt.bit_length() - 1):  # log2(Bt) doublings
        msum = pdbl(msum, curve, unroll=False)

    return padd(g_total, msum, curve, unroll=False)
