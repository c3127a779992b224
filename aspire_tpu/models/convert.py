"""HF torch BERT checkpoint -> aspire_tpu Flax params conversion.

Lets the framework load the published aspire/scibert/specter weights
(e.g. allenai/aspire-contextualsentence-singlem-compsci) without torch at
inference time: conversion happens once offline, the result is saved with
orbax.  Works from a raw `state_dict` (tensor name -> numpy) so it accepts
either `transformers` models or bare `pytorch_model.bin` files.
"""
from __future__ import annotations

import numpy as np

from .bert import BertConfig


def _t(arr) -> np.ndarray:
    """torch tensor/ndarray -> float32 numpy."""
    if hasattr(arr, "detach"):
        arr = arr.detach().cpu().numpy()
    return np.asarray(arr, dtype=np.float32)


def params_from_hf_state_dict(state_dict: dict, config: BertConfig) -> dict:
    """Map an HF BERT state_dict onto the aspire_tpu BertModel param tree.

    Accepts keys with or without the leading "bert." prefix.  Dense kernels
    are transposed (torch stores [out, in]; flax wants [in, out]).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("bert.").removeprefix("bert_encoder.")
        sd[k] = _t(v)

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def layernorm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
            "LayerNorm": layernorm("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention_self": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
            },
            "attention_output_dense": dense(f"{p}.attention.output.dense"),
            "attention_output_LayerNorm": layernorm(f"{p}.attention.output.LayerNorm"),
            "intermediate_dense": dense(f"{p}.intermediate.dense"),
            "output_dense": dense(f"{p}.output.dense"),
            "output_LayerNorm": layernorm(f"{p}.output.LayerNorm"),
        }
    return params


def pooler_params_from_hf_state_dict(state_dict: dict) -> dict | None:
    """Extract the BertPooler (`pooler_output` head) params, if present.

    Checkpoints saved with `add_pooling_layer=False` (and the aspire
    encoders, which never use the pooler) lack the keys -> None.  Needed by
    the SimCSE baselines, whose encode returns per-sentence pooler outputs
    (reference utils/models.py:330-357)."""
    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}
    if "pooler.dense.weight" not in sd:
        return None
    return {"dense": {"kernel": _t(sd["pooler.dense.weight"]).T,
                      "bias": _t(sd["pooler.dense.bias"])}}


def params_from_hf_model(hf_model, config: BertConfig | None = None) -> dict:
    """Convert a live `transformers` BertModel (or model with .bert)."""
    if config is None:
        c = hf_model.config
        config = BertConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            layer_norm_eps=c.layer_norm_eps,
        )
    return params_from_hf_state_dict(hf_model.state_dict(), config)


def config_from_hf(hf_config) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
    )
