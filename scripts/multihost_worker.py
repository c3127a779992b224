"""One process of a multi-host (DCN) training job, for execution testing.

The reference scales training with torch DDP: one process per GPU, NCCL
process groups (main_fsim.py:36-46), per-rank pre-split data files
(run_main_fsim-ddp.sh:51-90), and an explicit barrier every iteration
(trainer.py:693).  The TPU-native replacement is multi-controller JAX:
each host process calls `parallel.mesh.initialize_multihost`, builds the
SAME mesh over the global device list, streams the SAME data, and runs the
identical jitted train step -- `shard_batch` places only the rows this
process's devices own and XLA emits the cross-host gradient reductions.

This worker runs that protocol end to end on CPU devices (the JAX
distributed runtime speaks gRPC between local processes exactly as it does
between DCN-connected hosts) so the multi-host path is EXECUTED, not just
compiled: N processes train a tiny model in lockstep through the real
Trainer (early-stop dev scoring, shared-directory orbax checkpointing,
process-0-only metrics), then each process dumps its replicated final
params for the cross-process / vs-single-process parity assertions in
tests/test_multihost_dcn.py.

Usage (one invocation per process, same --out for all):
  python scripts/multihost_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id 0 --out /tmp/dcn
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_superbatch(rng, n_micro=2, b=8, t=16, smax=4):
    """Deterministic tiny superbatch (identical on every process)."""
    import numpy as np

    def feats():
        return {
            "token_ids": rng.integers(5, 128, (n_micro, b, t)).astype(np.int32),
            "attn_mask": np.ones((n_micro, b, t), np.int32),
            "sent_ids": np.clip(rng.integers(-1, smax, (n_micro, b, t)), -1,
                                smax - 1).astype(np.int32),
            "abs_lens": rng.integers(1, smax + 1, (n_micro, b)).astype(np.int32),
        }
    return {"query": feats(), "pos": feats()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True,
                    help="SHARED output dir (all processes)")
    ap.add_argument("--n-batches", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (the test passes 'cpu': the "
                         "JAX_PLATFORMS env var alone does not override an "
                         "installed TPU plugin)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.num_processes > 1:
        from aspire_tpu.parallel.mesh import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)

    import numpy as np
    from aspire_tpu.core.config import RunConfig
    from aspire_tpu.models.bert import BertConfig
    from aspire_tpu.models.doc_models import build_model
    from aspire_tpu.parallel.mesh import make_mesh
    from aspire_tpu.train.trainer import Trainer

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2max",
        "train_size": 48, "batch_size": 8, "accumulated_batch_size": 16,
        "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 4,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    model = build_model(cfg.model, BertConfig.tiny())

    rng = np.random.default_rng(0)
    batches = [make_superbatch(rng) for _ in range(args.n_batches)]
    dev_rng = np.random.default_rng(1)
    dev_batch = make_superbatch(dev_rng, n_micro=1)
    # dev batches are flat [batch, ...] pytrees (no micro axis)
    dev_flat = jax.tree_util.tree_map(lambda x: x[0], dev_batch)

    mesh = make_mesh()   # ALL global devices, across every process
    trainer = Trainer(model, cfg, str(out / "run"), mesh=mesh)
    state = trainer.init_state(jax.random.key(0))
    state = trainer.train(state, batches,
                          dev_batches_fn=lambda: iter([dev_flat]), seed=7)

    # replicated global arrays are fully host-readable on every process
    params = jax.device_get(state.params)
    flat = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(out / f"params-proc{args.process_id}.npz", **flat)
    (out / f"summary-proc{args.process_id}.json").write_text(json.dumps({
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "losses": [float(x) for x in trainer.loss_history],
        "dev_scores": [float(x) for x in trainer.dev_score_history],
        "best_score": float(trainer.best_score),
    }))
    print(f"[proc {args.process_id}] done: {jax.process_count()} processes, "
          f"{len(jax.devices())} global devices", flush=True)


if __name__ == "__main__":
    main()
