"""On-device synthesis of 1M-capable int8 dense indexes for benchmarks.

Builds per-bucket int8 sentence matrices + scales + consistent norms in
SECONDS on device (vs the ~25 min host build serve_bench pays), with
transient HBM bounded by a ~64 MB generation chunk:

  * random bits are drawn CHUNKED at the final byte width ([chunk, s, d/4]
    uint32 words, bitcast to int8) inside a fori_loop that updates the
    bucket in place -- NOT jax.random.randint over the whole bucket, whose
    threefry expansion materializes multi-GB u32 temps (27.5 GB of HLO temp
    for the 400k-doc bucket even jitted: the round-5 audit OOMs).
  * each bucket is one jitted program, so the f32 upcast inside the norm
    reduction fuses into the reduce instead of materializing [n, s, d] f32
    eagerly (another 4x transient on the axon backend, where every eager op
    is a separate dispatch).

Bucket mix approximates the fine-bucket histogram of Poisson(9) sentence
counts (the serve_bench --fine-buckets config used for the measured 1M-doc
rows in RESULTS_r5.md).
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# (sent_count, fraction of docs) ~ Poisson(9) clipped to [3, 20] under the
# fine (8, 12, 16, 20, 24) bucket boundaries
MIX = ((8, 0.44), (12, 0.40), (16, 0.13), (20, 0.03))


def _pick_chunk(n: int, s: int, d: int, target_bytes: int = 1 << 26) -> int:
    """Largest multiple-of-8 divisor of n whose chunk stays under target."""
    target = max(8, target_bytes // (s * d))
    best = 0
    for c in range(8, min(n, target) + 1, 8):
        if n % c == 0:
            best = c
    return best or n


@partial(jax.jit, static_argnames=("n", "s", "d", "chunk"))
def _synth_bucket_arrays(key, n, s, d, chunk):
    k1, k2 = jax.random.split(key)

    # chunked generation: XLA's threefry expansion materializes ~8x the
    # output bytes in u32 temps when asked for the whole bucket in one op
    # (27.5 GB of HLO temp for the 400k-doc bucket -- the round-5 audit
    # OOM), so generate [chunk, s, d/4] words per fori_loop trip and
    # dynamic_update_slice into the (in-place, loop-carried) int8 buffer.
    def body(i, sents):
        bits = jax.random.bits(jax.random.fold_in(k1, i),
                               (chunk, s, d // 4), jnp.uint32)
        blk = jax.lax.bitcast_convert_type(bits, jnp.int8) \
            .reshape(chunk, s, d)
        # clamp -128 -> -127: keeps randint(-127, 128) value-range parity
        # (the 2/256 weight at -127 is irrelevant for bandwidth/layout
        # measurement).  Formulated as where(==) because
        # jnp.maximum(int8, int8 scalar) loses the clamp inside the fused
        # jitted program on the TPU backend (verified on chip 2026-08-20;
        # eager maximum clamps correctly).
        blk = jnp.where(blk == jnp.int8(-128), jnp.int8(-127), blk)
        return jax.lax.dynamic_update_slice(sents, blk, (i * chunk, 0, 0))

    sents = jax.lax.fori_loop(0, n // chunk, body,
                              jnp.zeros((n, s, d), jnp.int8))
    scales = jnp.abs(jax.random.normal(k2, (n, s), jnp.float32)) * 0.02 + 1e-3
    norms = jnp.sum(jnp.square(sents.astype(jnp.float32)), axis=2) * scales ** 2
    return sents, scales, norms


def synth_bucket(key, n, s, d):
    """One dense int8 bucket: sents/norms/scales/doc_idx device arrays."""
    sents, scales, norms = _synth_bucket_arrays(key, n, s, d,
                                                _pick_chunk(n, s, d))
    return {"sents": sents, "norms": norms, "scales": scales,
            "doc_idx": jnp.arange(n, dtype=jnp.int32)}


def synth_device_index(docs: int, d: int = 768, mix=MIX):
    """Full synthetic index: (bucket list, (doc_bucket, doc_row, doc_len)).

    Buckets are generated sequentially (largest first under MIX) so the
    transient peak stays ~2x one bucket above the resident total.  doc_idx
    is globally offset across buckets; the pos arrays are the doc ->
    (bucket, row, len) inverse map the fused serving path takes.  Every doc
    in a bucket uses the full bucket length (layout/timing only cares about
    shapes and bytes, not ragged realism).
    """
    key = jax.random.key(0)
    dev, db_parts, dr_parts, dl_parts = [], [], [], []
    off = 0
    for i, (s, frac) in enumerate(mix):
        n = max(8, int(docs * frac) // 8 * 8)
        b = synth_bucket(jax.random.fold_in(key, i), n, s, d)
        b["doc_idx"] = b["doc_idx"] + off
        dev.append(b)
        db_parts.append(np.full((n,), i, np.int32))
        dr_parts.append(np.arange(n, dtype=np.int32))
        dl_parts.append(np.full((n,), s, np.int32))
        off += n
    jax.block_until_ready(dev[-1]["norms"])
    pos = tuple(jnp.asarray(np.concatenate(p))
                for p in (db_parts, dr_parts, dl_parts))
    gb = sum(float(np.prod(v.shape)) * v.dtype.itemsize
             for b in dev for v in b.values()) / 1e9
    print(f"synth index: {off} docs, {gb:.2f} GB on device", flush=True)
    return dev, pos
