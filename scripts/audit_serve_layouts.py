"""On-chip audit: do the serving programs relayout index args per dispatch?

Background: the 1M-doc fused-batched OOM report (RESULTS_r5.md) showed XLA
compiling a `copy(args_5_)` of the largest int8 bucket INTO the program --
a per-dispatch relayout of index data.  `benchmarks/timing.py:timed_loop`
times iterations inside one jitted fori_loop, where such a copy is
loop-invariant and amortized across iterations; real serving pays it once
per query.  This script makes the discrepancy measurable and, if present,
fixes it by committing the index arrays in the executable's preferred
input formats (jax.experimental.layout).

For every serving program at a mid-size int8 config it reports:
  1. compiled input formats vs the actual on-device array formats
     (mismatch == a compiled-in relayout copy);
  2. the in-jit amortized per-call time (timed_loop, the number benches
     quote) vs the TRUE per-dispatch time measured by pipelining N
     separate dispatches and fetching once (async dispatch: the tunnel
     RTT is paid once, each dispatch pays its full program);
  3. the same per-dispatch time after device_put-ing the args into the
     executable's input formats.

Run: python scripts/audit_serve_layouts.py [--docs 300000]
"""
import argparse
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "benchmarks"))

from aspire_tpu.index.dense import (build_dense_index, flatten_device_buckets,
                                    make_dense_search,
                                    make_dense_search_batched)
from aspire_tpu.index.serve import make_fused_query, make_fused_query_batched
from timing import timed_loop, tunnel_rtt


def fmt(x):
    try:
        return str(x.format.layout)
    except Exception:
        return "?"


def per_dispatch_ms(f, n, *args, n_warm: int = 2):
    """True per-dispatch seconds: N pipelined dispatches, one fetch."""
    for _ in range(n_warm):  # first 1-2 executions carry one-off
        out = f(*args)       # layout/transfer work (CLAUDE.md)
        jax.device_get(jax.tree.leaves(out)[0][..., :1])
    rtt = tunnel_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0][..., :1])
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n * 1000


ONLY = None   # optional substring filter on program names (--only)
N_WARM = 2    # warm executions before per-dispatch timing (--warm)


def audit(name, f, args, loop_body, loop_iters=30, n_dispatch=20):
    if ONLY is not None and ONLY not in name:
        return None
    lowered = jax.jit(f).lower(*args) if not hasattr(f, "lower") else f.lower(*args)
    compiled = lowered.compile()
    try:
        want = compiled.input_formats[0]
    except Exception as e:
        want = None
        print(f"[{name}] input_formats unavailable: {e}")
    n_mismatch = 0
    if want is not None:
        for i, (w, a) in enumerate(zip(want, args)):
            have = getattr(a, "format", None)
            if hasattr(a, "format") and w is not None and w.layout is not None \
                    and str(w.layout) != str(have.layout):
                n_mismatch += 1
                if n_mismatch <= 4:
                    print(f"[{name}] arg{i}: program wants {w.layout}, "
                          f"array has {have.layout}  shape={a.shape} {a.dtype}")
    print(f"[{name}] mismatched args: {n_mismatch}", flush=True)
    inloop = timed_loop(loop_body, loop_iters, *args) * 1000
    disp = per_dispatch_ms(f, n_dispatch, *args, n_warm=N_WARM)
    print(f"[{name}] in-jit amortized {inloop:.3f} ms vs per-dispatch "
          f"{disp:.3f} ms (ratio {disp / inloop:.2f}x)", flush=True)
    if n_mismatch and want is not None:
        fixed = [jax.device_put(a, w) if hasattr(a, "format") and w is not None
                 else a for a, w in zip(args, want)]
        disp2 = per_dispatch_ms(f, n_dispatch, *fixed, n_warm=N_WARM)
        print(f"[{name}] per-dispatch after committing program layouts: "
              f"{disp2:.3f} ms")
    return disp


from synth_index import synth_device_index  # noqa: E402 (path hack above)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300000)
    ap.add_argument("--fine-buckets", action="store_true")
    ap.add_argument("--synth", action="store_true",
                    help="synthesize the index on device (enables --docs "
                         "1000000 in seconds; implies fine buckets)")
    ap.add_argument("--batch", type=int, default=0,
                    help="also audit the batched search + fused programs "
                         "at this query batch size")
    ap.add_argument("--q-chunk", type=int, default=4)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter: audit only matching programs")
    ap.add_argument("--warm", type=int, default=2,
                    help="warm executions before per-dispatch timing")
    args_cli = ap.parse_args()
    global ONLY, N_WARM
    ONLY, N_WARM = args_cli.only, args_cli.warm
    assert jax.default_backend() == "tpu", jax.default_backend()
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()

    d = 768
    rng = np.random.default_rng(0)
    if args_cli.synth:
        dev8, pos8 = synth_device_index(args_cli.docs, d)
        flat8 = flatten_device_buckets(dev8)
    else:
        lens = np.clip(rng.poisson(9, args_cli.docs), 3, 20)
        print(f"building {args_cli.docs}-doc int8 index...", flush=True)
        doc_reps = [rng.standard_normal((l, d), dtype=np.float32) * 2
                    for l in lens]
        buckets = (8, 12, 16, 20, 24) if args_cli.fine_buckets else (12, 24)
        idx8 = build_dense_index(doc_reps,
                                 [f"p{i}" for i in range(args_cli.docs)],
                                 buckets=buckets, dtype="int8")
        del doc_reps
        dev8 = idx8.device_arrays()
        flat8 = flatten_device_buckets(dev8)
        pos8 = idx8.device_pos_arrays()
    qpad = jnp.asarray(np.pad(rng.standard_normal((10, d)).astype(np.float32) * 2,
                              ((0, 6), (0, 0))))

    search8 = make_dense_search(len(dev8), k=64, int8=True)

    def search_body(acc, qpad, q_len, *flat8):
        v, i = search8(qpad + acc * 0.0, q_len, *flat8)
        return v[0]

    audit("search_int8", search8, (qpad, jnp.int32(10), *flat8), search_body)

    fq = make_fused_query(len(dev8), k=64, max_sents=20, int8=True,
                          temp=5000.0, scaling=0.9, max_iters=128,
                          solver="pallas")

    def fused_body(acc, qpad, q_len, *rest):
        v, dd, s = fq(qpad + acc * 0.0, q_len, *rest)
        return s[0]

    audit("fused_query_int8", fq, (qpad, jnp.int32(10), *flat8, *pos8),
          fused_body)

    if args_cli.batch:
        B = args_cli.batch
        qb = jnp.asarray(
            rng.standard_normal((B, 16, d)).astype(np.float32) * 2)
        qlb = jnp.full((B,), 10, jnp.int32)

        sb = make_dense_search_batched(len(dev8), k=64, int8=True,
                                       q_chunk=min(8, B))

        def search_b_body(acc, qb, qlb, *flat8):
            v, i = sb(qb + acc * 0.0, qlb, *flat8)
            return v[0, 0]

        audit(f"search_int8_batched_B{B}", sb, (qb, qlb, *flat8),
              search_b_body, loop_iters=10, n_dispatch=8)

        fqb = make_fused_query_batched(
            len(dev8), k=64, max_sents=20, int8=True,
            q_chunk=min(args_cli.q_chunk, B), temp=5000.0, scaling=0.9,
            max_iters=128, solver="pallas")

        def fused_b_body(acc, qb, qlb, *rest):
            v, dd, s = fqb(qb + acc * 0.0, qlb, *rest)
            return s[0, 0]

        audit(f"fused_query_int8_batched_B{B}", fqb,
              (qb, qlb, *flat8, *pos8), fused_b_body,
              loop_iters=10, n_dispatch=8)


if __name__ == "__main__":
    main()
