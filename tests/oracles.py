"""Tiny CPU/torch oracle implementations used ONLY by the test suite.

These restate the published math of the reference scoring functions
(arXiv:2111.08366 / allenai/aspire pair_distances.py semantics) in
straightforward numpy/torch so the JAX/TPU implementations can be validated
against an independent computation.  They are deliberately naive: per-example
Python loops, dense masks, no batching tricks.
"""
from __future__ import annotations

import numpy as np
import torch

PAD_NEG = -10e8


def np_cdist(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact pairwise L2 distances, [n, d] x [m, d] -> [n, m]."""
    diff = q[:, None, :] - c[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=-1))


def masked_neg_dists(q, c, ql, cl):
    """-L2 with -10e8 added outside the valid (ql, cl) rectangle."""
    neg = -np_cdist(q, c)
    mask = np.full(neg.shape, PAD_NEG)
    mask[:ql, :cl] = 0.0
    return neg + mask


def oracle_l2max(q, c, ql, cl):
    return np.max(masked_neg_dists(q, c, ql, cl))


def oracle_l2topk(q, c, ql, cl, k=2):
    flat = np.sort(masked_neg_dists(q, c, ql, cl).ravel())[::-1]
    return float(np.sum(flat[:k]))


def oracle_l2sup(q, c, ql, cl, qi, ci):
    qi = min(qi, ql - 1)
    ci = min(ci, cl - 1)
    return np_cdist(q, c)[qi, ci]  # positive distance at the aligned cell


def oracle_attention(q, c, ql, cl, temp=1.0, test_time=False):
    neg = -np_cdist(q, c)
    logits = neg / temp
    m = np.full(neg.shape, -1e32)
    m[:ql, :cl] = 0.0
    flat = logits + m
    sm = torch.softmax(torch.from_numpy(flat.ravel()), dim=0).numpy().reshape(neg.shape)
    if test_time:
        return float(np.sum(sm * neg))
    return float(np.sum(sm * (-neg)))


def oracle_ot_marginals(q, c, ql, cl, temp=1.0):
    neg = masked_neg_dists(q, c, ql, cl)
    qmax = neg.max(axis=1)
    cmax = neg.max(axis=0)
    a = torch.softmax(torch.from_numpy(qmax / temp), dim=0).numpy()
    b = torch.softmax(torch.from_numpy(cmax / temp), dim=0).numpy()
    return a, b, neg


def exact_ot_cost(a, b, cost):
    """Unregularized OT via scipy linprog -- limit of Sinkhorn as blur -> 0."""
    from scipy.optimize import linprog

    n, m = cost.shape
    # Variables: flattened plan. Equality constraints: row sums = a, col sums = b.
    a_eq = []
    b_eq = []
    for i in range(n):
        row = np.zeros((n, m))
        row[i, :] = 1.0
        a_eq.append(row.ravel())
        b_eq.append(a[i])
    for j in range(m - 1):  # drop one redundant constraint
        col = np.zeros((n, m))
        col[:, j] = 1.0
        a_eq.append(col.ravel())
        b_eq.append(b[j])
    res = linprog(cost.ravel(), A_eq=np.array(a_eq), b_eq=np.array(b_eq),
                  bounds=(0, None), method="highs")
    assert res.success, res.message
    return res.fun


def geomloss_style_sinkhorn(a, x, b, y, blur=0.05, scaling=0.9):
    """Full float64 re-statement of the annealed symmetric Sinkhorn with the
    geomloss eps schedule, used to validate the f32 JAX solver."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    cost = np_cdist(x, y)

    mins = np.minimum(x.min(axis=0), y.min(axis=0))
    maxs = np.maximum(x.max(axis=0), y.max(axis=0))
    diameter = float(np.linalg.norm(maxs - mins))

    eps_list = [diameter] + [
        float(np.exp(e))
        for e in np.arange(np.log(diameter), np.log(blur), np.log(scaling))
    ] + [blur]

    def softmin(eps, C, h):
        v = h[None, :] - C / eps
        vmax = v.max(axis=1, keepdims=True)
        return -eps * (np.log(np.exp(v - vmax).sum(axis=1)) + vmax[:, 0])

    log_a = np.where(a > 0, np.log(np.maximum(a, 1e-300)), -100000.0)
    log_b = np.where(b > 0, np.log(np.maximum(b, 1e-300)), -100000.0)

    eps0 = eps_list[0]
    f = softmin(eps0, cost, log_b)
    g = softmin(eps0, cost.T, log_a)
    for eps in eps_list:
        ft = softmin(eps, cost, log_b + g / eps)
        gt = softmin(eps, cost.T, log_a + f / eps)
        f, g = 0.5 * (f + ft), 0.5 * (g + gt)
    # last extrapolation at eps = blur
    f, g = softmin(blur, cost, log_b + g / blur), softmin(blur, cost.T, log_a + f / blur)
    return f, g, cost
