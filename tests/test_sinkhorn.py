"""Validation of the geomloss-compatible Sinkhorn solver.

Three independent checks (geomloss itself is unavailable in this image):
1. float64 numpy restatement of the annealed symmetric Sinkhorn with the
   geomloss schedule (tests/oracles.py) -- potentials must match closely.
2. exact (unregularized) OT from scipy linprog -- the Sinkhorn cost at small
   blur must approach it from above-ish within O(blur * log) slack.
3. structural checks: recovered transport plan has the right marginals;
   gradients flow through the final extrapolation.
"""
import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.sinkhorn import sinkhorn_potentials, sinkhorn_cost
from aspire_tpu.ops.distances import wasserstein_dist, ot_marginals
from oracles import geomloss_style_sinkhorn, exact_ot_cost, np_cdist


def rand_cloud(rng, n, m, d, pad_n=0, pad_m=0):
    x = rng.normal(size=(n + pad_n, d)).astype(np.float32)
    y = rng.normal(size=(m + pad_m, d)).astype(np.float32)
    x[n:] = 0.0
    y[m:] = 0.0
    a = np.zeros(n + pad_n, np.float32)
    b = np.zeros(m + pad_m, np.float32)
    a[:n] = rng.random(n).astype(np.float32) + 0.1
    b[:m] = rng.random(m).astype(np.float32) + 0.1
    a /= a.sum()
    b /= b.sum()
    return a, x, b, y


def test_potentials_match_float64_oracle(rng):
    a, x, b, y = rand_cloud(rng, n=6, m=9, d=4)
    f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None])
    f, g = np.asarray(f)[0], np.asarray(g)[0]
    f64, g64, _ = geomloss_style_sinkhorn(a, x, b, y)
    np.testing.assert_allclose(f, f64, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g, g64, rtol=1e-3, atol=1e-3)


def test_potentials_match_oracle_with_pads(rng):
    a, x, b, y = rand_cloud(rng, n=5, m=4, d=4, pad_n=3, pad_m=2)
    f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None])
    f, g = np.asarray(f)[0], np.asarray(g)[0]
    f64, g64, _ = geomloss_style_sinkhorn(a, x, b, y)
    # only compare on atoms that carry mass; pad potentials are irrelevant
    np.testing.assert_allclose(f[:5], f64[:5], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g[:4], g64[:4], rtol=1e-3, atol=1e-3)


def test_cost_approaches_exact_ot(rng):
    a, x, b, y = rand_cloud(rng, n=5, m=6, d=3)
    cost = np_cdist(x.astype(np.float64), y.astype(np.float64))
    exact = exact_ot_cost(a.astype(np.float64), b.astype(np.float64), cost)
    f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None],
                               blur=0.01, scaling=0.95)
    approx = float(np.asarray(sinkhorn_cost(jnp.asarray(a[None]), f, jnp.asarray(b[None]), g, blur=0.01))[0])
    # entropic bias is O(blur * log(nm))
    assert abs(approx - exact) < 0.05, (approx, exact)


def test_plan_marginals(rng):
    q = rng.normal(size=(2, 8, 16)).astype(np.float32)
    c = rng.normal(size=(2, 6, 16)).astype(np.float32)
    ql = np.array([8, 5], np.int32)
    cl = np.array([6, 3], np.int32)
    for i in range(2):
        q[i, ql[i]:] = 0.0
        c[i, cl[i]:] = 0.0
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    w, (a, b, pair_sims, plan, masked) = wasserstein_dist(qv, cv, temp=1.0, return_pair_sims=True)
    plan = np.asarray(plan)
    a, b = np.asarray(a), np.asarray(b)
    for i in range(2):
        # transport plan at blur=0.05 approximately satisfies both marginals
        np.testing.assert_allclose(plan[i].sum(axis=1), a[i], atol=2e-2)
        np.testing.assert_allclose(plan[i].sum(axis=0), b[i], atol=2e-2)
        # no mass on pads
        assert plan[i, ql[i]:, :].max(initial=0.0) < 1e-6
        assert plan[i, :, cl[i]:].max(initial=0.0) < 1e-6
    # the plan-weighted similarity sum is a (negative) similarity score
    assert np.asarray(w).shape == (2,)


def test_wasserstein_train_grad_flows(rng):
    q = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    qv_lens = jnp.array([5, 3], jnp.int32)
    cv_lens = jnp.array([4, 4], jnp.int32)

    def loss(qe):
        qv = MultiVec(embed=qe, lens=qv_lens)
        cv = MultiVec(embed=c, lens=cv_lens)
        return jnp.sum(wasserstein_dist(qv, cv, temp=1.0))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0


def test_annealed_matches_converged_fixed_eps(rng):
    """Second independent oracle: plain (non-annealed) log-domain Sinkhorn at
    eps=blur iterated to convergence in float64.  Annealing is only an
    accelerator -- the final potentials must induce the same entropic OT cost
    (potentials are unique up to +c/-c, which cancels in the cost)."""
    a, x, b, y = rand_cloud(rng, n=6, m=7, d=4)
    cost = np_cdist(x.astype(np.float64), y.astype(np.float64))
    blur = 0.05
    log_a = np.log(a.astype(np.float64))
    log_b = np.log(b.astype(np.float64))

    def softmin(eps, C, h):
        v = h[None, :] - C / eps
        vmax = v.max(axis=1, keepdims=True)
        return -eps * (np.log(np.exp(v - vmax).sum(axis=1)) + vmax[:, 0])

    f = np.zeros(len(a))
    g = np.zeros(len(b))
    for _ in range(5000):  # plain alternating updates at fixed eps
        f = softmin(blur, cost, log_b + g / blur)
        g = softmin(blur, cost.T, log_a + f / blur)
    cost_fixed = float(np.sum(a * f) + np.sum(b * g))

    f_j, g_j = sinkhorn_potentials(a[None], x[None], b[None], y[None], blur=blur)
    cost_annealed = float(np.asarray(
        sinkhorn_cost(jnp.asarray(a[None]), f_j, jnp.asarray(b[None]), g_j,
                      blur=blur))[0])
    np.testing.assert_allclose(cost_annealed, cost_fixed, rtol=2e-3, atol=2e-3)


def test_sinkhorn_jit_and_vmap_consistency(rng):
    # batch solve == per-example solve (identical diameters via same cloud box)
    a, x, b, y = rand_cloud(rng, n=6, m=6, d=4)
    f1, g1 = sinkhorn_potentials(a[None], x[None], b[None], y[None])
    # duplicated batch gives identical rows
    f2, g2 = sinkhorn_potentials(
        np.stack([a, a]), np.stack([x, x]), np.stack([b, b]), np.stack([y, y]))
    np.testing.assert_allclose(np.asarray(f2)[0], np.asarray(f2)[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1)[0], np.asarray(f2)[0], atol=1e-5)


def test_pair_diameter_excludes_pads(rng):
    """'pair' mode reproduces the reference's UNPADDED 1x1 geomloss call:
    appending zero-mass zero-point pad rows must not change the potentials.
    The cloud sits away from the origin so an unmasked box would inflate by
    ~the mean norm and lengthen the eps schedule."""
    a, x, b, y = rand_cloud(rng, n=5, m=6, d=8)
    x = x + 3.0
    y = y + 3.0
    f0, g0 = sinkhorn_potentials(a[None], x[None], b[None], y[None],
                                 diameter="pair")
    xp = np.concatenate([x, np.zeros((3, 8), np.float32)])
    ap = np.concatenate([a, np.zeros(3, np.float32)])
    yp = np.concatenate([y, np.zeros((2, 8), np.float32)])
    bp = np.concatenate([b, np.zeros(2, np.float32)])
    fp, gp = sinkhorn_potentials(ap[None], xp[None], bp[None], yp[None],
                                 diameter="pair")
    np.testing.assert_allclose(np.asarray(fp)[0, :5], np.asarray(f0)[0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp)[0, :6], np.asarray(g0)[0],
                               rtol=1e-5, atol=1e-5)
    # and both match the f64 oracle run on the unpadded tensors (what the
    # reference's evaluate path feeds geomloss)
    f64, g64, _ = geomloss_style_sinkhorn(a, x, b, y)
    np.testing.assert_allclose(np.asarray(fp)[0, :5], f64, rtol=1e-3, atol=1e-3)
    # pallas solver applies the same masked per-lane diameter
    from aspire_tpu.ops.pallas_sinkhorn import sinkhorn_potentials_pallas
    fpl, gpl = sinkhorn_potentials_pallas(
        jnp.asarray(ap[None]), jnp.asarray(xp[None]), jnp.asarray(bp[None]),
        jnp.asarray(yp[None]), diameter="pair", interpret=True)
    np.testing.assert_allclose(np.asarray(fpl)[0, :5], np.asarray(f0)[0],
                               rtol=2e-3, atol=2e-3)


def test_schedule_below_blur_matches_oracle(rng):
    """A cloud tighter than blur runs geomloss's [d, blur] schedule, not
    [blur, blur] (epsilon_schedule's arange is empty when d < blur)."""
    a, x, b, y = rand_cloud(rng, n=4, m=5, d=6)
    x = x * 0.003 + 1.0          # joint diameter ~0.02 < blur=0.05
    y = y * 0.003 + 1.0
    f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None])
    f64, g64, _ = geomloss_style_sinkhorn(a, x, b, y)
    np.testing.assert_allclose(np.asarray(f)[0], f64, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g)[0], g64, rtol=1e-3, atol=1e-4)


def test_identical_clouds_stay_finite(rng):
    """Coincident point clouds (diameter 0) must not divide by zero."""
    a, x, b, y = rand_cloud(rng, n=4, m=4, d=6)
    y = x.copy()
    b = a.copy()
    f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None])
    cost = np.asarray(sinkhorn_cost(jnp.asarray(a[None]), f,
                                    jnp.asarray(b[None]), g))
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(cost).all()
    # identical clouds + identical weights: the symmetric updates give f == g
    # (debias=False keeps an entropic offset, so the cost itself is not 0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(g), rtol=1e-5,
                               atol=1e-6)


def test_scaling_out_of_range_raises(rng):
    a, x, b, y = rand_cloud(rng, n=3, m=3, d=4)
    import pytest
    with pytest.raises(ValueError, match="scaling"):
        sinkhorn_potentials(a[None], x[None], b[None], y[None], scaling=1.0)
    from aspire_tpu.ops.pallas_sinkhorn import sinkhorn_potentials_pallas
    with pytest.raises(ValueError, match="scaling"):
        sinkhorn_potentials_pallas(jnp.asarray(a[None]), jnp.asarray(x[None]),
                                   jnp.asarray(b[None]), jnp.asarray(y[None]),
                                   scaling=1.5, interpret=True)


def _plan_from_potentials(a, x, b, y, f, g, blur):
    """pi_ij = a_i b_j exp((f_i + g_j - C_ij)/eps) at the extrapolation
    eps=blur -- the primal point the dual potentials certify."""
    C = np_cdist(x.astype(np.float64), y.astype(np.float64))
    af = a.astype(np.float64)
    bg = b.astype(np.float64)
    logpi = ((f.astype(np.float64)[:, None] + g.astype(np.float64)[None, :]
              - C) / blur)
    with np.errstate(over="ignore"):
        pi = af[:, None] * bg[None, :] * np.exp(logpi)
    # an overflowing plan entry means the potentials are nowhere near
    # feasible -- surface it as a hard failure, not a warning
    assert np.isfinite(pi).all(), "plan reconstruction overflowed"
    return pi, C


def _duality_gap_check(a, x, b, y, f, g, blur):
    """Marginal violations + |primal - dual| for one solved instance.

    primal = <pi, C> + eps*KL(pi || a (x) b)  (entropic primal, unnormalized
    KL), dual = <a,f> + <b,g> - eps*(mass(pi) - 1).  The identity
    primal - dual = <f, pi1 - a> + <g, pi^T 1 - b> ties the gap to the
    marginal violations, so checking BOTH against eps-scaled bounds verifies
    the potentials are a genuine near-optimal primal-dual pair -- not just
    internally consistent numbers (VERDICT r4 #6; geomloss semantics
    pair_distances.py:61-92)."""
    # slice to mass-carrying atoms BEFORE reconstruction: pad atoms carry
    # floor potentials (log-weight -1e5) whose exp overflows, and 0 * inf
    # would poison the whole plan
    live_a, live_b = a > 0, b > 0
    pi, C = _plan_from_potentials(a[live_a], x[live_a], b[live_b], y[live_b],
                                  f[live_a], g[live_b], blur)
    aa, bb = a[live_a].astype(np.float64), b[live_b].astype(np.float64)
    row, col = pi.sum(1), pi.sum(0)
    viol = max(np.abs(row - aa).sum(), np.abs(col - bb).sum())
    ab = aa[:, None] * bb[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        kl = np.where(pi > 0, pi * np.log(pi / ab), 0.0).sum() - pi.sum() + 1.0
    primal = (pi * C).sum() + blur * kl
    dual = (aa * f[live_a]).sum() + (bb * g[live_b]).sum() \
        - blur * (pi.sum() - 1.0)
    return float(viol), float(abs(primal - dual)), float(primal), float(dual)


def test_duality_gap_property_battery(rng):
    """100+ random (marginals, clouds, scale, blur, scaling) instances +
    degenerate cases: the recovered plan's marginal violations and the
    primal-dual gap stay within eps-scaled bounds.  Independent of the f64
    oracle (which shares an author with the solver): duality is a property
    of the OT problem itself."""
    N = M = 12
    checked = 0
    for blur, scaling in [(0.01, 0.9), (0.05, 0.9), (0.05, 0.7),
                          (0.1, 0.95), (0.5, 0.9)]:
        B = 24
        A = np.zeros((B, N), np.float32)
        Bw = np.zeros((B, M), np.float32)
        X = np.zeros((B, N, 6), np.float32)
        Y = np.zeros((B, M, 6), np.float32)
        for i in range(B):
            n = int(rng.integers(1, N + 1))
            m = int(rng.integers(1, M + 1))
            scale = float(10.0 ** rng.uniform(-1.5, 1.5))
            X[i, :n] = rng.normal(size=(n, 6)) * scale
            Y[i, :m] = rng.normal(size=(m, 6)) * scale
            if i % 8 == 5:        # coincident clouds
                k = min(n, m)
                Y[i, :k] = X[i, :k]
            if i % 8 == 6:        # single-atom source (1-sentence doc)
                n = 1
                X[i, 1:] = 0.0
            A[i, :n] = rng.random(n) + 0.05
            Bw[i, :m] = rng.random(m) + 0.05
            A[i] /= A[i].sum()
            Bw[i] /= Bw[i].sum()
        # max_iters must cover the schedule length: at scaling=0.95 with
        # diameters up to ~150 the geometric schedule needs ~143 entries,
        # and a truncated schedule hands the extrapolation badly
        # unconverged potentials (violations blow past any bound)
        f, g = sinkhorn_potentials(jnp.asarray(A), jnp.asarray(X),
                                   jnp.asarray(Bw), jnp.asarray(Y),
                                   blur=blur, scaling=scaling,
                                   diameter="pair", max_iters=512)
        f, g = np.asarray(f), np.asarray(g)
        assert np.isfinite(f).all() and np.isfinite(g).all()
        for i in range(B):
            viol, gap, primal, dual = _duality_gap_check(
                A[i], X[i], Bw[i], Y[i], f[i], g[i], blur)
            # geomloss-semantics potentials take ONE extrapolation step at
            # eps=blur after the annealing loop, so the plan is near- (not
            # exactly) feasible; 0.30 on unit total mass still certifies an
            # approximately feasible primal-dual pair (calibrated: worst
            # observed 0.22 at scaling=0.7, tightening to 0.015 at
            # scaling=0.995 -- see test_duality_gap_tight_at_convergence)
            assert viol < 0.30, (viol, blur, scaling, i)
            scale_bound = max(1.0, np.abs(f[i]).max(), np.abs(g[i]).max())
            assert gap <= 0.30 * scale_bound + 1e-6, (
                gap, scale_bound, blur, scaling, i)
            checked += 1
    assert checked >= 100, checked


def test_duality_gap_tight_at_convergence(rng):
    """With a slow schedule (scaling->1) and small blur the battery's
    bounds must TIGHTEN: near-converged potentials give near-zero marginal
    violation and a duality gap O(eps) -- the quantitative check that the
    solver actually converges toward the optimal primal-dual pair rather
    than just satisfying loose bounds."""
    blur = 0.01
    for i in range(8):
        a, x, b, y = rand_cloud(rng, n=int(rng.integers(2, 8)),
                                m=int(rng.integers(2, 8)), d=4)
        viols = {}
        for scaling, iters in [(0.9, 128), (0.995, 2048)]:
            f, g = sinkhorn_potentials(a[None], x[None], b[None], y[None],
                                       blur=blur, scaling=scaling,
                                       max_iters=iters)
            f, g = np.asarray(f)[0], np.asarray(g)[0]
            viol, gap, primal, dual = _duality_gap_check(a, x, b, y, f, g,
                                                         blur)
            viols[scaling] = viol
        # near convergence (slow schedule): tight feasibility + tight gap
        assert viol < 0.03, (viol, i)
        assert gap < 0.03, (gap, i)
        # slower schedule must certify a tighter (or equal) primal
        assert viols[0.995] <= viols[0.9] + 1e-3, viols
        # and the certified dual value brackets the exact LP cost within
        # O(blur * log(nm)) entropic bias
        cost = np_cdist(x.astype(np.float64), y.astype(np.float64))
        live = (a > 0, b > 0)
        exact = exact_ot_cost(a[live[0]].astype(np.float64),
                              b[live[1]].astype(np.float64),
                              cost[np.ix_(*live)])
        assert abs(dual - exact) < 0.06, (dual, exact, i)
