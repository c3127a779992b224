"""Honest TPU timing under the axon tunnel.

Two measurement hazards in this environment:
  * `block_until_ready` does not actually block over the tunnel;
  * each host<->device round trip (device_get or per-call dispatch) costs a
    ~25 ms network RTT.

`timed_loop` therefore (a) repeats the op inside ONE jitted fori_loop with a
serial data dependency, (b) fetches one scalar with device_get, and
(c) subtracts a calibrated RTT measured on a trivial jit.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

_RTT_CACHE: list[float] = []


def tunnel_rtt(n: int = 10) -> float:
    """Median round-trip of a trivial jit + device_get."""
    if _RTT_CACHE:
        return _RTT_CACHE[0]

    @jax.jit
    def nothing(x):
        return x + 1.0

    x = jnp.float32(3.0)
    jax.device_get(nothing(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(nothing(x))
        ts.append(time.perf_counter() - t0)
    _RTT_CACHE.append(float(np.median(ts)))
    return _RTT_CACHE[0]


def commit_program_layouts(compiled, args):
    """device_put args whose on-device layout differs from the compiled
    program's preferred input format.

    Arrays produced by OTHER jitted programs (e.g. an on-device synthesized
    index) can carry layouts the consumer program does not want; XLA then
    compiles a relayout copy INTO the program -- per-dispatch time and, for
    multi-GB index args, transient HBM the chip may not have.  Production
    serving commits the index once; benchmarks opt in via
    timed_loop(..., commit_layouts=True) to measure the same steady state.

    Returns (new_args, n_relayouted).  Callers must drop any OTHER references
    to the originals (a stale list keeps both copies alive in HBM).
    """
    try:
        want = compiled.input_formats[0]
    except Exception:
        return args, 0
    out, n = [], 0
    for a, w in zip(args, want):
        fmt = getattr(a, "format", None)
        if fmt is not None and w is not None and w.layout is not None \
                and str(w.layout) != str(fmt.layout):
            a = jax.device_put(a, w)
            n += 1
        out.append(a)
    return tuple(out), n


def timed_loop(fn, n_iter: int, *args, commit_layouts: bool = False) -> float:
    """Mean seconds per call of fn(acc, *args) -> scalar, RTT-corrected.

    fn must consume `acc` (a f32 scalar) so iterations serialize, and return
    a f32 scalar.  commit_layouts: device_put args into the loop program's
    preferred input formats first (see commit_program_layouts).
    """
    rtt = tunnel_rtt()

    @jax.jit
    def loop(*args):
        return jax.lax.fori_loop(0, n_iter,
                                 lambda i, acc: fn(acc, *args), jnp.float32(0.0))

    if commit_layouts:
        compiled = loop.lower(*args).compile()
        args, n = commit_program_layouts(compiled, args)
        if n:
            print(f"[timed_loop] committed {n} args to program layouts",
                  flush=True)

    # compile + TWO warm executions: the first 1-2 executions of a large
    # program over the tunnel carry one-off layout/transfer work (CLAUDE.md);
    # steady state is reached by call 3
    jax.device_get(loop(*args))
    jax.device_get(loop(*args))
    t0 = time.perf_counter()
    jax.device_get(loop(*args))
    return max((time.perf_counter() - t0 - rtt), 1e-9) / n_iter
