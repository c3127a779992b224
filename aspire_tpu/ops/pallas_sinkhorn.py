"""Pallas TPU kernel: batched annealed log-domain Sinkhorn.

Layout insight: a single OT problem here is tiny (<= ~24 x 24 sentences) --
far below VPU width -- so the kernel puts the BATCH on the 128-lane axis and
the two sentence axes on sublanes: cost lives as [N, M, B_tile].  Every
softmin then reduces over a sublane axis while vectorizing over 128+ batch
lanes, and each batch tile's whole annealing loop runs out of VMEM (one HBM
read of the cost, one write of the potentials).

Semantics match ops.sinkhorn.sinkhorn_potentials exactly (same eps schedule,
symmetric 0.5-averaged Jacobi updates, final extrapolation at eps=blur);
parity-tested in tests/test_pallas.py.  Pads are handled the geomloss way --
log-weights floored at -1e5.  Forward-only: training-time differentiation
uses the XLA path (query-time scoring needs no gradients).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cdist import pairwise_l2
from .sinkhorn import (log_weights, max_diameter, pairwise_diameter,
                       _schedule_len, _LOG_WEIGHT_FLOOR)
from .pallas_util import round_up as _round_up


def _sinkhorn_kernel(scalars_ref, diam_ref, cost_ref, loga_ref, logb_ref,
                     f_ref, g_ref, *, blur: float, scaling: float,
                     max_iters: int):
    """One batch tile, batch-on-lanes layout.

    diam: [1, TB] per-lane annealing diameters ('global' mode passes the
    same value on every lane); cost: [N, M, TB]; log_a/f: [N, TB];
    log_b/g: [M, TB].
    """
    n_cap = scalars_ref[0].astype(jnp.int32)   # max schedule length (batch)
    diam = diam_ref[...]                       # [1, TB]
    cost = cost_ref[...]
    log_a = loga_ref[...]
    log_b = logb_ref[...]
    log_scaling = math.log(scaling)
    # per-lane schedule length (mirrors sinkhorn._schedule_len: K + 2 with
    # K = ceil(log(blur/d)/log(s)) clamped at 0); early lanes freeze below
    ratio = jnp.log(blur / jnp.maximum(diam, 1e-30)) / log_scaling
    lane_iters = jnp.ceil(jnp.maximum(ratio, 0.0)) + 2.0

    # Both softmins of an iteration share the same eps, so the [N, M, TB]
    # `cost/eps` tensor is computed ONCE per iteration (as cost * 1/eps --
    # TPU VPU divides are multi-op) and threaded to both; this removes one
    # full-size VPU pass per softmin vs dividing inline.
    def softmin_over_m(eps, ce, h):
        # eps: [1, TB]; ce = cost/eps [N, M, TB];
        # f[i, b] = -eps[b] * lse_j(h[j, b] - ce[i, j, b])
        t = h[None, :, :] - ce
        m = jnp.max(t, axis=1)
        return -eps * (jnp.log(jnp.sum(jnp.exp(t - m[:, None, :]), axis=1)) + m)

    def softmin_over_n(eps, ce, h):
        # g[j, b] = -eps[b] * lse_i(h[i, b] - ce[i, j, b])
        t = h[:, None, :] - ce
        m = jnp.max(t, axis=0)
        return -eps * (jnp.log(jnp.sum(jnp.exp(t - m[None, :, :]), axis=0)) + m)

    def eps_at(i):
        # eps_list[i] = [d, d, d*s, ..., blur]: last entry pinned at blur,
        # earlier entries unfloored (matches sinkhorn._eps_at -- for d < blur
        # geomloss runs [d, blur], not [blur, blur]); the 1e-12 floor only
        # guards division for coincident clouds
        k = jnp.maximum(i - 1, 0).astype(jnp.float32)
        d = jnp.maximum(diam, 1e-12)
        return jnp.where(i.astype(jnp.float32) >= lane_iters - 1.0,
                         jnp.float32(blur), d * jnp.exp(k * log_scaling))

    eps0 = eps_at(jnp.int32(0))
    inv0 = 1.0 / eps0
    ce0 = cost * inv0
    f = softmin_over_m(eps0, ce0, log_b)
    g = softmin_over_n(eps0, ce0, log_a)

    def body(i, fg):
        f, g = fg
        eps = eps_at(i)
        inv_eps = 1.0 / eps
        ce = cost * inv_eps
        ft = softmin_over_m(eps, ce, log_b + g * inv_eps)
        gt = softmin_over_n(eps, ce, log_a + f * inv_eps)
        live = (i.astype(jnp.float32) < lane_iters)   # [1, TB]
        f = jnp.where(live, 0.5 * (f + ft), f)
        g = jnp.where(live, 0.5 * (g + gt), g)
        return (f, g)

    # Dynamic trip count to the batch-max schedule length; per-lane `live`
    # masks freeze lanes whose own schedule ended (iterations past the
    # schedule were frozen no-ops in the old select-freeze form, so this is
    # exact).  Measured on v5e (round 2): dynamic bound 0.60 ms vs fixed-128
    # 0.68 ms per 1024-pair chunk -- the earlier "dynamic is slower" finding
    # no longer holds on current Mosaic.
    ncap = jnp.minimum(n_cap, max_iters)
    f, g = jax.lax.fori_loop(0, ncap, body, (f, g))
    eps_b = jnp.full_like(diam, blur)
    ce_b = cost * (1.0 / blur)
    f_ref[...] = softmin_over_m(eps_b, ce_b, log_b + g / blur)
    g_ref[...] = softmin_over_n(eps_b, ce_b, log_a + f / blur)


@partial(jax.jit, static_argnames=("blur", "scaling", "max_iters", "batch_tile",
                                   "interpret", "use_cost", "diameter"))
def sinkhorn_potentials_pallas(
    a: jax.Array, x: jax.Array, b: jax.Array, y: jax.Array,
    blur: float = 0.05, scaling: float = 0.9, max_iters: int = 128,
    batch_tile: int = 256, interpret: bool = False,
    cost: jax.Array | None = None, use_cost: bool = False,
    diameter: str = "global",
    diameter_value: jax.Array | None = None,
):
    """Drop-in forward replacement for sinkhorn_potentials (balanced case).

    a: [bsz, n]; x: [bsz, n, d]; b: [bsz, m]; y: [bsz, m, d].
    cost: optional precomputed f32[bsz, n, m] ground cost (pass
    use_cost=True) -- callers that already built the masked cost matrix
    (ot_marginals) avoid a second pairwise_l2.
    diameter: 'global' (one annealing start for the whole batch) or 'pair'
    (per-element -- the eval path); both ride the same per-lane kernel.
    Returns (f [bsz, n], g [bsz, m]) float32.
    """
    if not 0.0 < scaling < 1.0:
        raise ValueError(f"scaling must be in (0, 1), got {scaling}")
    bsz, n = a.shape
    m = b.shape[1]
    if not use_cost:
        cost = pairwise_l2(x, y)
    if diameter_value is not None:
        diam = jnp.broadcast_to(jnp.asarray(diameter_value, jnp.float32),
                                (bsz,))
    elif diameter == "pair":
        diam = pairwise_diameter(x, y, a, b)                   # [bsz]
    else:
        diam = jnp.broadcast_to(max_diameter(x, y), (bsz,))    # [bsz]
    n_cap = jnp.max(_schedule_len(diam, blur, scaling)).astype(jnp.float32)

    n_p = _round_up(max(n, 8), 8)
    m_p = _round_up(max(m, 8), 8)
    b_p = _round_up(max(bsz, 128), batch_tile)
    # batch-on-lanes layout: [N, M, B], [N, B], [M, B]
    cost_p = jnp.full((n_p, m_p, b_p), 1e6, jnp.float32)
    cost_p = cost_p.at[:n, :m, :bsz].set(jnp.transpose(cost, (1, 2, 0)))
    la = jnp.full((n_p, b_p), _LOG_WEIGHT_FLOOR, jnp.float32)
    la = la.at[:n, :bsz].set(log_weights(a).T)
    lb = jnp.full((m_p, b_p), _LOG_WEIGHT_FLOOR, jnp.float32)
    lb = lb.at[:m, :bsz].set(log_weights(b).T)
    # pad lanes anneal for a single step (diam=blur) and freeze
    diam_p = jnp.full((1, b_p), blur, jnp.float32)
    diam_p = diam_p.at[0, :bsz].set(diam)
    scalars = jnp.stack([n_cap]).astype(jnp.float32)

    grid = (b_p // batch_tile,)
    kernel = partial(_sinkhorn_kernel, blur=blur, scaling=scaling,
                     max_iters=max_iters)
    f, g = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, batch_tile), lambda i, s: (0, i)),
                pl.BlockSpec((n_p, m_p, batch_tile), lambda i, s: (0, 0, i)),
                pl.BlockSpec((n_p, batch_tile), lambda i, s: (0, i)),
                pl.BlockSpec((m_p, batch_tile), lambda i, s: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((n_p, batch_tile), lambda i, s: (0, i)),
                pl.BlockSpec((m_p, batch_tile), lambda i, s: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_p, b_p), jnp.float32),
            jax.ShapeDtypeStruct((m_p, b_p), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, diam_p, cost_p, la, lb)
    return f[:n, :bsz].T, g[:m, :bsz].T
