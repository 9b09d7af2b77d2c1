"""Multi-chip MSM: points sharded over a device mesh, SPMD via shard_map.

The reference is strictly single-device (SURVEY.md §2 "no distributed
parallelism strategies and no communication backend"); this module is the
new first-class distributed component BASELINE.json's north star requires
(points/scalars sharded over chips, per-chip sums reduced over ICI).

Design: the per-window reduction G_w = sum_b (b+1) * S_{w,b} is LINEAR in
the bucket sums, and bucket sums are linear in the point set — so each
chip runs the ENTIRE local pipeline (decompose -> sort -> SMVP -> PBPR)
on its point shard and only the per-window sums (W points, ~5 KB) cross
the interconnect: one all-gather + a replicated log2(ndev) halving tree
of complete adds. Communication is O(W * L) regardless of n — the MSM
analogue of data parallelism with a gradient-sized all-reduce.

Mesh axes: 'x' shards the point stream (DP); an optional 'w' axis
shards the window/bucket space (the model-parallel analogue) — each
w-shard runs sort/extraction/PBPR on its padded_windows/wdev block
only, and per-window sums are reassembled with an all-gather over 'w'
(see make_sharded_windows_fn).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MSMConfig, default_config
from ..constants import CurveParams
from ..ops.complete import ProjPoint, padd
from ..reference import curve as ref
from .. import cuzk
from ..cuzk.pipeline import MSMPipeline, _windows_device

P = jax.sharding.PartitionSpec


def _reduce_gathered(g: ProjPoint, curve: CurveParams, ndev: int) -> ProjPoint:
    """(ndev, L, W) gathered per-chip window sums -> (L, W) via a static
    halving tree of complete adds (replicated on every chip)."""
    x, y, z = g
    d = ndev
    while d > 1:
        h = d // 2
        p1 = ProjPoint(x[:h], y[:h], z[:h])
        p2 = ProjPoint(x[h:d], y[h:d], z[h:d])
        # limb axis is axis 1 here; padd is shape-agnostic past axis 0 of
        # the limb dimension, so move limbs first
        s = padd(ProjPoint(jnp.moveaxis(p1.x, 1, 0), jnp.moveaxis(p1.y, 1, 0),
                           jnp.moveaxis(p1.z, 1, 0)),
                 ProjPoint(jnp.moveaxis(p2.x, 1, 0), jnp.moveaxis(p2.y, 1, 0),
                           jnp.moveaxis(p2.z, 1, 0)),
                 curve, unroll=False)
        x = jnp.moveaxis(s.x, 0, 1)
        y = jnp.moveaxis(s.y, 0, 1)
        z = jnp.moveaxis(s.z, 0, 1)
        d = h
    return ProjPoint(x[0], y[0], z[0])


def make_sharded_windows_fn(cfg: MSMConfig, mesh: jax.sharding.Mesh):
    """Build the jitted SPMD windows function for `mesh`.

    Mesh axes: 'x' shards the point stream (DP; per-chip sums combine
    with one all-gather + a complete-add tree — communication O(W*L)).
    An optional second axis 'w' shards the WINDOW dimension (the
    model-parallel analogue): each w-shard decomposes all windows
    locally (cheap, elementwise) but sorts/extracts/reduces only its
    padded_windows/wdev block, so the bucket-space stages scale with
    the mesh. Window blocks are reassembled with an all-gather over 'w'
    (O(W*L) bytes again — the per-window sums, never the buckets).

    Inputs are (L, n) / (H, n) planar arrays sharded on the n axis
    (replicated over 'w'); output is the replicated per-window
    ProjPoint (L, W_padded)."""
    ndev = mesh.shape["x"]
    wdev = mesh.shape.get("w", 1)
    if cfg.num_groups % wdev:
        raise ValueError("mesh axis 'w' must divide num_groups "
                         f"({cfg.num_groups} groups, {wdev} shards)")
    windows_fn = MSMPipeline.windows_fn(cfg)

    def per_chip(xs, ys, hw):
        if wdev > 1:
            g = windows_fn(xs, ys, hw, cfg=cfg, w_shards=wdev,
                           w_index=jax.lax.axis_index("w"))
            # reassemble the window axis: shard i owns windows
            # [i*Wl, (i+1)*Wl) -> concat in axis-index order
            def regather(a):                       # (L, Wl) -> (L, Wp)
                ga = jax.lax.all_gather(a, "w")    # (wdev, L, Wl)
                return jnp.moveaxis(ga, 0, 1).reshape(
                    a.shape[0], wdev * a.shape[1])
            g = ProjPoint(regather(g.x), regather(g.y), regather(g.z))
        else:
            g = windows_fn(xs, ys, hw, cfg=cfg)           # local (L, Wp)
        gx = jax.lax.all_gather(g.x, "x")                  # (ndev, L, Wp)
        gy = jax.lax.all_gather(g.y, "x")
        gz = jax.lax.all_gather(g.z, "x")
        r = _reduce_gathered(ProjPoint(gx, gy, gz), cfg.curve, ndev)
        return r.x, r.y, r.z

    spec = P(None, "x")
    fn = jax.shard_map(per_chip, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=(P(None, None),) * 3,
                       check_vma=False)
    return jax.jit(fn)


class ShardedMSMPipeline(MSMPipeline):
    """MSMPipeline over a device mesh: same host API, sharded device path.

    Padding must make the per-chip shard a multiple of cfg.columns."""

    def __init__(self, config: MSMConfig, mesh: jax.sharding.Mesh):
        self.config = config
        self.mesh = mesh
        self.ndev = mesh.shape["x"]
        self._fn = make_sharded_windows_fn(config, mesh)
        self._sharding = jax.sharding.NamedSharding(mesh, P(None, "x"))

    def padded_size(self, n: int) -> int:
        unit = self.config.columns * self.ndev
        return max(unit, -(-n // unit) * unit)

    def window_sums(self, xs, ys, halfwords):
        cfg = self.config
        c = cfg.curve
        put = lambda a: jax.device_put(jnp.asarray(a), self._sharding)
        gx, gy, gz = self._fn(put(xs), put(ys), put(halfwords))
        from ..utils.limbs_conversion import planar_signed_to_ints_modp
        xi = planar_signed_to_ints_modp(np.asarray(gx), c)
        yi = planar_signed_to_ints_modp(np.asarray(gy), c)
        zi = planar_signed_to_ints_modp(np.asarray(gz), c)
        out = []
        for x, y, z in zip(xi, yi, zi):
            if z == 0:
                out.append(ref.INF)
            else:
                inv = pow(z, -1, c.p)
                out.append(((x * inv) % c.p, (y * inv) % c.p, 1))
        return out[: cfg.num_windows]


_SHARDED_CACHE = {}


def get_sharded_pipeline(config: MSMConfig, mesh: jax.sharding.Mesh
                         ) -> ShardedMSMPipeline:
    key = (config, mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
    pipe = _SHARDED_CACHE.get(key)
    if pipe is None:
        pipe = _SHARDED_CACHE[key] = ShardedMSMPipeline(config, mesh)
    return pipe


def sharded_msm(points: Sequence[Tuple[int, int]], scalars: Sequence[int],
                mesh: jax.sharding.Mesh, config: MSMConfig | None = None,
                curve: CurveParams | None = None):
    """Multi-chip variable-base MSM (host API mirroring
    tpu_variable_base_msm)."""
    if len(points) == 0 or len(scalars) == 0:
        raise ValueError("sharded_msm: empty input")
    n = min(len(points), len(scalars))
    points, scalars = points[:n], scalars[:n]
    if config is None:
        config = default_config(n, curve) if curve else default_config(n)
    return get_sharded_pipeline(config, mesh).msm(points, scalars)
