"""One-off probe: why does the 1M fused single-query program cost ~35 ms
per dispatch but ~20 ms amortized in-jit with ZERO input-format mismatches?

Hypotheses tested, each as a separate compiled program dispatched 20x:
  a. full outputs (v, dd, s)      -- what per_dispatch_ms measured (35.7)
  b. only s[0] (scalar)           -- the in-jit loop body's DCE shape
  c. only (dd, s)                 -- what production rank consumes
  d. b with outputs device-fetched each dispatch (serialized, upper bound)
"""
import pathlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "benchmarks"))

from aspire_tpu.index.dense import flatten_device_buckets, make_dense_search
from aspire_tpu.index.serve import make_fused_query
from synth_index import synth_device_index
from timing import tunnel_rtt


def disp_ms(f, args, n=20, n_warm=3):
    for _ in range(n_warm):
        out = f(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    rtt = tunnel_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n * 1000


def main():
    assert jax.default_backend() == "tpu"
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    d = 768
    dev8, pos8 = synth_device_index(1_000_000, d)
    flat8 = flatten_device_buckets(dev8)
    rng = np.random.default_rng(0)
    qpad = jnp.asarray(np.pad(rng.standard_normal((10, d)).astype(np.float32) * 2,
                              ((0, 6), (0, 0))))
    fq = make_fused_query(len(dev8), k=64, max_sents=20, int8=True,
                          temp=5000.0, scaling=0.9, max_iters=128,
                          solver="pallas")
    args = (qpad, jnp.int32(10), *flat8, *pos8)

    full = jax.jit(lambda *a: fq(*a))
    s_only = jax.jit(lambda *a: fq(*a)[2][0])
    prod = jax.jit(lambda *a: fq(*a)[1:])
    print(f"a. full (v, dd, s): {disp_ms(full, args):.2f} ms", flush=True)
    print(f"b. s[0] only      : {disp_ms(s_only, args):.2f} ms", flush=True)
    print(f"c. (dd, s)        : {disp_ms(prod, args):.2f} ms", flush=True)

    # d. serialized: fetch after every dispatch (tunnel RTT included)
    rtt = tunnel_rtt()
    f = s_only
    out = f(*args); jax.device_get(out)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        jax.device_get(f(*args))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"d. serialized s[0] (incl {rtt*1000:.1f} ms RTT): {dt:.2f} ms",
          flush=True)

    # e. first stage search alone, per-dispatch, for the same index
    search8 = make_dense_search(len(dev8), k=64, int8=True)
    sargs = (qpad, jnp.int32(10), *flat8)
    sfull = jax.jit(lambda *a: search8(*a))
    print(f"e. search (v, i)  : {disp_ms(sfull, sargs):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
