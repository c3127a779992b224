"""Benchmark entry point (driver contract).

Measures the BASELINE.json headline: batched Sinkhorn OT pair-scorings per
second per chip (target >= 10,000 on v5e), using the production otAspire
configuration (blur 0.05, scaling 0.9, sent_sm_temp 5000, 768-d reps, up to
20 sentences/doc -- pair_distances.py:16-19 + miswordbienc-otstuni-best.json).

Timing methodology: the remote-TPU tunnel in this environment makes
`block_until_ready` unreliable and adds a ~25 ms RTT per host round trip, so
the op repeats inside ONE jitted fori_loop with a serial data dependency,
timed around a single `device_get`, minus a calibrated RTT
(benchmarks/timing.py).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent / "benchmarks"))

import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.distances import wasserstein_dist
from timing import timed_loop

TARGET = 10_000.0  # pair-scorings/sec/chip (BASELINE.md)


def main():
    batch = 1024         # candidate pairs scored per call (throughput peak)
    smax, d = 20, 768
    key = jax.random.key(0)
    kq, kc, kl1, kl2 = jax.random.split(key, 4)
    q_embed = jax.random.normal(kq, (batch, smax, d), jnp.float32) * 2.0
    c_embed = jax.random.normal(kc, (batch, smax, d), jnp.float32) * 2.0
    q_lens = jax.random.randint(kl1, (batch,), 4, smax + 1)
    c_lens = jax.random.randint(kl2, (batch,), 4, smax + 1)

    def one(acc, q_embed, c_embed, q_lens, c_lens):
        q = MultiVec(embed=q_embed + acc * 0.0, lens=q_lens)
        c = MultiVec(embed=c_embed, lens=c_lens)
        # solver='pallas': the production serving/rerank solver (forward-
        # only VMEM-resident kernel; geomloss-parity schedule + scores)
        sims, _ = wasserstein_dist(q, c, blur=0.05, scaling=0.9,
                                   temp=5000.0, return_pair_sims=True,
                                   solver="pallas")
        return sims[0]

    dt = timed_loop(one, 100, q_embed, c_embed, q_lens, c_lens)
    rate = batch / dt

    print(json.dumps({
        "metric": "sinkhorn_pair_scorings_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(rate / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
