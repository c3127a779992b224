"""Benchmark entry point (driver contract).

Measures the BASELINE.json headline: batched Sinkhorn OT pair-scorings per
second per chip (target >= 10,000 on v5e), using the production otAspire
configuration (blur 0.05, scaling 0.9, sent_sm_temp 5000, 768-d reps, up to
20 sentences/doc -- pair_distances.py:16-19 + miswordbienc-otstuni-best.json).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.distances import wasserstein_dist

TARGET = 10_000.0  # pair-scorings/sec/chip (BASELINE.md)


def main():
    batch = 256          # candidate pairs scored per call
    smax, d = 20, 768
    key = jax.random.key(0)
    kq, kc, kl1, kl2 = jax.random.split(key, 4)
    q_embed = jax.random.normal(kq, (batch, smax, d), jnp.float32) * 2.0
    c_embed = jax.random.normal(kc, (batch, smax, d), jnp.float32) * 2.0
    q_lens = jax.random.randint(kl1, (batch,), 4, smax + 1)
    c_lens = jax.random.randint(kl2, (batch,), 4, smax + 1)
    q = MultiVec(embed=q_embed, lens=q_lens)
    c = MultiVec(embed=c_embed, lens=c_lens)

    @jax.jit
    def score(q, c):
        sims, _ = wasserstein_dist(q, c, blur=0.05, scaling=0.9,
                                   temp=5000.0, return_pair_sims=True)
        return sims

    # warmup / compile
    score(q, c).block_until_ready()
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = score(q, c)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    rate = batch * n_iters / dt

    print(json.dumps({
        "metric": "sinkhorn_pair_scorings_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(rate / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
