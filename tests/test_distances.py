"""Golden-value tests for the pair scoring functions vs. independent oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.distances import (
    l2max_dist, l2topk_dist, l2sup_dist, l2sup_weighted_dist,
    attention_dist, jointsm_dist, ot_marginals,
)
from oracles import (
    oracle_l2max, oracle_l2topk, oracle_l2sup, oracle_attention,
    oracle_ot_marginals, np_cdist,
)


def make_batch(rng, b=4, smax_q=7, smax_c=5, d=16, scale=1.0):
    q = rng.normal(size=(b, smax_q, d)).astype(np.float32) * scale
    c = rng.normal(size=(b, smax_c, d)).astype(np.float32) * scale
    ql = rng.integers(1, smax_q + 1, size=b).astype(np.int32)
    cl = rng.integers(1, smax_c + 1, size=b).astype(np.int32)
    # zero the pads like the real encoder output path does
    for i in range(b):
        q[i, ql[i]:] = 0.0
        c[i, cl[i]:] = 0.0
    return q, c, ql, cl


def test_l2max(rng):
    q, c, ql, cl = make_batch(rng)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    got = np.asarray(l2max_dist(qv, cv))
    want = np.array([-oracle_l2max(q[i], c[i], ql[i], cl[i]) for i in range(len(ql))])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # test-time path returns sims (negated) and the masked matrix
    sims, pair = l2max_dist(qv, cv, return_pair_sims=True)
    np.testing.assert_allclose(np.asarray(sims), -want, rtol=1e-5, atol=1e-5)
    assert pair.shape == (4, 7, 5)


def test_l2topk(rng):
    q, c, ql, cl = make_batch(rng)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    got = np.asarray(l2topk_dist(qv, cv))
    want = np.array([-oracle_l2topk(q[i], c[i], ql[i], cl[i]) for i in range(len(ql))])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_l2sup_and_weighted(rng):
    q, c, ql, cl = make_batch(rng)
    b = len(ql)
    align = np.stack([rng.integers(0, 9, size=b), rng.integers(0, 9, size=b)], axis=1).astype(np.int32)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl), align=jnp.asarray(align))
    got = np.asarray(l2sup_dist(qv, cv))
    want = np.array([oracle_l2sup(q[i], c[i], ql[i], cl[i], align[i, 0], align[i, 1])
                     for i in range(b)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got_w = np.asarray(l2sup_weighted_dist(qv, cv))
    np.testing.assert_allclose(got_w, want / (ql * cl), rtol=1e-5, atol=1e-5)


def test_attention(rng):
    q, c, ql, cl = make_batch(rng)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    got_train = np.asarray(attention_dist(qv, cv, temp=1.0))
    want_train = np.array([oracle_attention(q[i], c[i], ql[i], cl[i]) for i in range(len(ql))])
    np.testing.assert_allclose(got_train, want_train, rtol=1e-4, atol=1e-4)

    got_test, aux = attention_dist(qv, cv, temp=1.0, return_pair_sims=True)
    want_test = np.array([oracle_attention(q[i], c[i], ql[i], cl[i], test_time=True)
                          for i in range(len(ql))])
    np.testing.assert_allclose(np.asarray(got_test), want_test, rtol=1e-4, atol=1e-4)
    # softmax mass confined to the valid rectangle
    sm = np.asarray(aux[1])
    for i in range(len(ql)):
        np.testing.assert_allclose(sm[i].sum(), 1.0, rtol=1e-5)
        assert sm[i, ql[i]:, :].max(initial=0.0) < 1e-12
        assert sm[i, :, cl[i]:].max(initial=0.0) < 1e-12


def test_ot_marginals_pads_get_no_mass(rng):
    q, c, ql, cl = make_batch(rng)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    a, b, neg = ot_marginals(qv, cv, temp=1.0)
    a, b = np.asarray(a), np.asarray(b)
    for i in range(len(ql)):
        wa, wb, _ = oracle_ot_marginals(q[i], c[i], ql[i], cl[i], temp=1.0)
        np.testing.assert_allclose(a[i], wa, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(b[i], wb, rtol=1e-4, atol=1e-6)
        assert a[i, ql[i]:].max(initial=0.0) == 0.0
        assert b[i, cl[i]:].max(initial=0.0) == 0.0


def test_jointsm_symmetric_score(rng):
    # independent restatement: scaled-dot joint softmax alignment
    q, c, ql, cl = make_batch(rng, d=8)
    qv = MultiVec(embed=jnp.asarray(q), lens=jnp.asarray(ql))
    cv = MultiVec(embed=jnp.asarray(c), lens=jnp.asarray(cl))
    got = np.asarray(jointsm_dist(qv, cv))
    import torch
    for i in range(len(ql)):
        sims = q[i] @ c[i].T / np.sqrt(8)
        m = np.full(sims.shape, -1e32)
        m[:ql[i], :cl[i]] = 0.0
        sm = torch.softmax(torch.from_numpy((sims + m).ravel()), 0).numpy().reshape(sims.shape)
        c2q = sm @ c[i]              # [sq, d]
        q2c = sm.T @ q[i]            # [sc, d]
        score = np.sum(q[i] * c2q) + np.sum(c[i] * q2c)
        np.testing.assert_allclose(got[i], -score, rtol=1e-4, atol=1e-4)
