"""Log-domain epsilon-scaled Sinkhorn solver, geomloss-compatible.

The reference scores document pairs with geomloss's annealed symmetric
Sinkhorn (``geomloss.SamplesLoss("sinkhorn", p=1, blur=0.05, scaling=0.9,
debias=False)`` -- src/learning/facetid_models/pair_distances.py:68-91).
geomloss is a CUDA/KeOps library; this module re-derives the same algorithm
as pure XLA-friendly JAX so it jits, vmaps, shards, and differentiates on TPU:

  * ground cost  C(x, y) = |x - y|_2          (geomloss "p=1")
  * eps schedule: diameter -> blur, geometric with ratio `scaling`, with the
    first value repeated (geomloss epsilon_schedule semantics) and a final
    entry pinned at `blur`.
  * symmetric Jacobi updates with 0.5-averaging per iteration,
  * log-weights floored at -1e5 for zero-mass atoms (geomloss log_weights),
  * final "extrapolation" half-step at eps=blur which is the only step
    gradients flow through (geomloss detaches the loop; we stop_gradient it),
  * balanced (reach=None) and unbalanced (reach=rho) damping.

Because the iteration count depends on the data diameter, the loop runs a
static `max_iters` bound with select-freezing past the true schedule length --
the XLA-safe equivalent of geomloss's dynamic Python loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cdist import pairwise_l2

_LOG_WEIGHT_FLOOR = -100000.0


def log_weights(a: jax.Array) -> jax.Array:
    """log(a) with zero/negative mass floored at -1e5 (geomloss log_weights).

    The inner clamp must be a *normal* f32 (subnormals are flushed to zero on
    XLA backends, which would make maximum() tie at 0 and leak log(0) = -inf
    into gradients).
    """
    return jnp.where(a > 0, jnp.log(jnp.maximum(a, 1e-30)), _LOG_WEIGHT_FLOOR)


def max_diameter(x: jax.Array, y: jax.Array) -> jax.Array:
    """Scalar diameter of the joint point cloud: |max - min|_2 over coords.

    Matches geomloss max_diameter: computed over ALL points of both clouds
    flattened across the batch (including zero pads -- the reference feeds
    padded reps straight into geomloss, so pads legitimately widen the box).
    """
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    yf = y.reshape(-1, d)
    mins = jnp.minimum(jnp.min(xf, axis=0), jnp.min(yf, axis=0))
    maxs = jnp.maximum(jnp.max(xf, axis=0), jnp.max(yf, axis=0))
    return jnp.linalg.norm(maxs - mins)


_BIG = 3.0e38


def pairwise_diameter(x: jax.Array, y: jax.Array,
                      x_weights: jax.Array | None = None,
                      y_weights: jax.Array | None = None) -> jax.Array:
    """Per-batch-element diameter f32[bsz]: each pair gets its own box.

    This is what geomloss sees when the reference scores pairs ONE AT A TIME
    (evaluate.py:35-82 feeds 1x1 pairs), so the eval stack uses it to make
    batched scoring independent of batch composition.  The reference's 1x1
    tensors carry NO pad rows, so when weights are given (zero mass = pad),
    zero-weight rows are excluded from the box -- a zero pad row would drag
    the box to the origin and inflate the diameter by ~the mean-vector norm
    for anisotropic encoder reps, lengthening the eps schedule vs the
    reference.  Each element must keep >= 1 real row per side."""
    if x_weights is None:
        mins_x, maxs_x = jnp.min(x, axis=1), jnp.max(x, axis=1)   # [bsz, d]
    else:
        mx = (x_weights > 0)[:, :, None]
        mins_x = jnp.min(jnp.where(mx, x, _BIG), axis=1)
        maxs_x = jnp.max(jnp.where(mx, x, -_BIG), axis=1)
    if y_weights is None:
        mins_y, maxs_y = jnp.min(y, axis=1), jnp.max(y, axis=1)
    else:
        my = (y_weights > 0)[:, :, None]
        mins_y = jnp.min(jnp.where(my, y, _BIG), axis=1)
        maxs_y = jnp.max(jnp.where(my, y, -_BIG), axis=1)
    mins = jnp.minimum(mins_x, mins_y)
    maxs = jnp.maximum(maxs_x, maxs_y)
    return jnp.linalg.norm(maxs - mins, axis=-1)


def _schedule_len(diameter: jax.Array, blur: float, scaling: float) -> jax.Array:
    """Number of annealing-loop iterations = len(geomloss eps_list).

    eps_list = [d] + [d * s^k for k in 0..K-1] + [blur] with
    K = ceil(log(blur/d) / log(s)) (the np.arange count), so len = K + 2.
    For d < blur the arange is empty (K = 0): eps_list = [d, blur].
    """
    ratio = jnp.log(blur / jnp.maximum(diameter, 1e-30)) / jnp.log(scaling)
    k = jnp.ceil(jnp.maximum(ratio, 0.0)).astype(jnp.int32)
    return k + 2


def _eps_at(i: jax.Array, diameter: jax.Array, blur: float, scaling: float,
            n_iters: jax.Array) -> jax.Array:
    """eps_list[i]: [d, d, d*s, d*s^2, ..., blur].

    The LAST schedule entry is pinned at blur; earlier entries are NOT
    floored there, so a degenerate cloud with d < blur runs geomloss's
    [d, blur] schedule rather than [blur, blur] (the empty-arange case
    above).  Entries past n_iters are dead (`live` masking in the loop).
    The 1e-12 floor only guards eps=0 division for coincident clouds --
    logsumexp is max-shifted, so huge cost/eps ratios stay finite."""
    k = jnp.maximum(i - 1, 0).astype(jnp.float32)
    d = jnp.maximum(diameter, 1e-12)
    return jnp.where(i >= n_iters - 1, jnp.float32(blur),
                     d * jnp.power(scaling, k))


@partial(jax.jit, static_argnames=("blur", "scaling", "reach", "max_iters",
                                   "use_cost", "diameter"))
def sinkhorn_potentials(
    a: jax.Array,
    x: jax.Array,
    b: jax.Array,
    y: jax.Array,
    blur: float = 0.05,
    scaling: float = 0.9,
    reach: float | None = None,
    max_iters: int = 128,
    cost: jax.Array | None = None,
    use_cost: bool = False,
    diameter: str = "global",
    diameter_value: jax.Array | None = None,
):
    """Solve regularized OT between weighted point clouds; return potentials.

    a: f32[bsz, n] source weights (may contain zeros for pads)
    x: f32[bsz, n, d] source points
    b: f32[bsz, m] target weights
    y: f32[bsz, m, d] target points
    cost: optional precomputed f32[bsz, n, m] ground cost (pass use_cost=True);
        otherwise the L2 ("p=1") cost is computed from x, y.
    diameter: 'global' anneals from the whole-batch diameter (geomloss on a
        batched call -- the reference's training path); 'pair' anneals each
        batch element from its own diameter (geomloss on 1x1 calls -- the
        reference's evaluate.py path; batched scores become independent of
        batch composition).
    diameter_value: optional precomputed annealing-start diameter (scalar or
        f32[bsz]), overriding the local computation.  Used by the sharded
        fused query path, where each shard holds only the candidate rows it
        owns: the true whole-pool diameter is assembled with a pmin/pmax over
        the mesh and passed down so every shard runs the exact schedule the
        single-device solve would.

    Returns (f, g): potentials f32[bsz, n], f32[bsz, m] such that the balanced
    OT cost is sum(a * f + b * g) -- exactly geomloss's potentials=True output
    for debias=False.
    """
    if not 0.0 < scaling < 1.0:
        # log(scaling) == 0 would give a NaN schedule length and a silent
        # zero-iteration solve; >1 a diverging schedule
        raise ValueError(f"scaling must be in (0, 1), got {scaling}")
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if use_cost:
        c_xy = cost.astype(jnp.float32)
    else:
        c_xy = pairwise_l2(x, y)
    c_yx = jnp.swapaxes(c_xy, 1, 2)

    bsz = a.shape[0]
    if diameter_value is not None:
        diam = jnp.broadcast_to(jnp.asarray(diameter_value, jnp.float32),
                                (bsz,))
    elif diameter == "pair":
        diam = pairwise_diameter(x, y, a, b)                # [bsz]
    else:
        diam = jnp.broadcast_to(max_diameter(x, y), (bsz,))  # [bsz]
    diam = jax.lax.stop_gradient(diam)
    n_iters = _schedule_len(diam, blur, scaling)             # [bsz]

    log_a = log_weights(a)
    log_b = log_weights(b)

    # --- Annealing loop: constant w.r.t. gradients (geomloss detaches it). ---
    c_xy_ng = jax.lax.stop_gradient(c_xy)
    c_yx_ng = jax.lax.stop_gradient(c_yx)
    log_a_ng = jax.lax.stop_gradient(log_a)
    log_b_ng = jax.lax.stop_gradient(log_b)

    def damping(eps):
        # eps: [bsz] -> damping factor [bsz, 1] (or python 1.0 when balanced)
        if reach is None:
            return 1.0
        rho = float(reach)  # rho = reach ** p with p = 1
        return 1.0 / (1.0 + eps[:, None] / rho)

    def softmin_b(eps, cost_, h):
        # per-element eps: [bsz]; cost_: [bsz, n, m]; h: [bsz, m]
        return -eps[:, None] * jax.scipy.special.logsumexp(
            h[:, None, :] - cost_ / eps[:, None, None], axis=2)

    eps0 = _eps_at(jnp.int32(0), diam, blur, scaling, n_iters)
    f = damping(eps0) * softmin_b(eps0, c_xy_ng, log_b_ng)
    g = damping(eps0) * softmin_b(eps0, c_yx_ng, log_a_ng)

    def body(i, fg):
        f, g = fg
        eps = _eps_at(i, diam, blur, scaling, n_iters)
        ft = damping(eps) * softmin_b(eps, c_xy_ng, log_b_ng + g / eps[:, None])
        gt = damping(eps) * softmin_b(eps, c_yx_ng, log_a_ng + f / eps[:, None])
        f_new = 0.5 * (f + ft)
        g_new = 0.5 * (g + gt)
        live = (i < n_iters)[:, None]
        f = jnp.where(live, f_new, f)
        g = jnp.where(live, g_new, g)
        return (f, g)

    # Dynamic trip count: iterations past every element's schedule length are
    # masked no-ops (`live` above), so stopping at max(n_iters) is exact.  For
    # production shapes the schedule needs ~70 iterations, not the 128 cap --
    # ~45% of the solve time.  Safe under autodiff: the whole loop is constant
    # w.r.t. gradients (stop_gradient above), so no transpose rule is needed.
    n_cap = jnp.minimum(jnp.max(n_iters), max_iters).astype(jnp.int32)
    _, (f, g) = jax.lax.while_loop(
        lambda st: st[0] < n_cap,
        lambda st: (st[0] + 1, body(st[0], st[1])),
        (jnp.int32(0), (f, g)))
    f = jax.lax.stop_gradient(f)
    g = jax.lax.stop_gradient(g)

    # --- Final extrapolation at eps = blur: the differentiable step. ---
    eps_b = jnp.full((bsz,), blur, jnp.float32)
    damp = damping(eps_b)
    f_out = damp * softmin_b(eps_b, c_xy, log_b + g / blur)
    g_out = damp * softmin_b(eps_b, c_yx, log_a + f / blur)
    return f_out, g_out


def sinkhorn_cost(
    a: jax.Array,
    f: jax.Array,
    b: jax.Array,
    g: jax.Array,
    blur: float = 0.05,
    reach: float | None = None,
) -> jax.Array:
    """OT cost from potentials: geomloss sinkhorn_cost with debias=False.

    Balanced: <a, f> + <b, g>.  Unbalanced: the KL-relaxed dual value with the
    (rho + eps/2) weighting geomloss applies.
    """
    if reach is None:
        return jnp.sum(a * f, axis=-1) + jnp.sum(b * g, axis=-1)
    rho = float(reach)
    w = rho + blur / 2.0
    fa = w * (1.0 - jnp.exp(-f / rho))
    gb = w * (1.0 - jnp.exp(-g / rho))
    return jnp.sum(a * fa, axis=-1) + jnp.sum(b * gb, axis=-1)
