"""FFN treatment bench: naive XLA dense-gelu-dense vs the fused pallas
kernel (ops/pallas_ffn.py), fwd and fwd+bwd at the train shape.

The r4 bisect measured the naive FFN at 5.75 ms/layer fwd+bwd (the largest
single train-step component; RESULTS_r4.md table).  Floors at the measured
MXU rate (~253 TF/s bf16): fwd 2*2*tokens*h*f FLOPs; bwd 2x fwd; the fused
kernel's backward recomputes the intermediate (+1x the first matmul).

Timing rules: input-serialized jitted fori_loop (the carry feeds x) with a
full f32-sum readout over ALL outputs/grad leaves -- nothing hoistable or
prunable (benchmarks/timing.py; the r3 hoisting/DCE artifact).

Run: python benchmarks/ffn_bench.py [--seqs 60] [--seq 512] [--iters 16]
"""
import argparse
import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop

from aspire_tpu.ops.pallas_ffn import fused_ffn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=60)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--f", type=int, default=3072)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()

    rows = args.seqs * args.seq
    h, f = args.h, args.f
    dt = jnp.bfloat16
    key = jax.random.key(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (rows, h), dt)
    w1 = jax.random.normal(ks[1], (h, f), dt) * 0.02
    b1 = jax.random.normal(ks[2], (f,), dt) * 0.02
    w2 = jax.random.normal(ks[3], (f, h), dt) * 0.02
    b2 = jax.random.normal(ks[4], (h,), dt) * 0.02

    def naive(x, w1, b1, w2, b2):
        inter = jax.nn.gelu((x @ w1 + b1), approximate=False)
        return inter @ w2 + b2

    def fused(x, w1, b1, w2, b2):
        return fused_ffn(x, w1, b1, w2, b2)

    report = {}

    def row(name, fn):
        # fwd: carry rides x so the matmuls stay live per iteration
        def fwd(acc, x, *ws):
            out = fn(x * (1.0 + acc * 0.0).astype(dt), *ws)
            return jnp.sum(out.astype(jnp.float32))

        sec = timed_loop(fwd, args.iters, x, w1, b1, w2, b2)
        report[f"{name}_fwd_ms"] = round(sec * 1e3, 3)

        def fwd_bwd(acc, x, *ws):
            def loss(x, *ws):
                return jnp.sum(fn(x, *ws).astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                x * (1.0 + acc * 0.0).astype(dt), *ws)
            return l + sum(g.sum().astype(jnp.float32) for g in grads)

        sec = timed_loop(fwd_bwd, args.iters, x, w1, b1, w2, b2)
        report[f"{name}_fwd_bwd_ms"] = round(sec * 1e3, 3)

    row("naive", naive)
    row("fused", fused)
    flops_fwd = 2 * rows * h * f * 2
    report["shape"] = f"[{rows},{h}]x[{h},{f}]"
    report["mxu_floor_fwd_ms_at_253tf"] = round(flops_fwd / 253e12 * 1e3, 2)
    report["mxu_floor_fwd_bwd_ms_at_253tf"] = round(
        3 * flops_fwd / 253e12 * 1e3, 2)
    report["fused_speedup_fwd_bwd"] = round(
        report["naive_fwd_bwd_ms"] / report["fused_fwd_bwd_ms"], 2)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
