"""Flax BERT parity vs. torch transformers (random tiny config) and
sentence-pooling parity vs. the reference's mask-average semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

import torch
import transformers

from aspire_tpu.models.bert import BertConfig, BertModel
from aspire_tpu.models.convert import params_from_hf_model, config_from_hf
from aspire_tpu.models.encoders import sentence_pool, ConSentEncoder, BiEncoder


@pytest.fixture(scope="module")
def tiny_pair():
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_model(hf, cfg)
    return hf, cfg, params


def test_bert_forward_matches_hf(tiny_pair, rng):
    hf, cfg, params = tiny_pair
    b, t = 3, 17
    ids = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[0, 12:] = 0
    mask[2, 5:] = 0
    with torch.no_grad():
        out = hf(torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long),
                 output_hidden_states=True)
    model = BertModel(cfg)
    last, hs = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    want = out.last_hidden_state.numpy()
    got = np.asarray(last)
    # compare only non-pad positions (pad positions diverge freely)
    for i in range(b):
        n = mask[i].sum()
        np.testing.assert_allclose(got[i, :n], want[i, :n], rtol=1e-4, atol=2e-5)
    assert len(hs) == cfg.num_hidden_layers + 1
    for l in range(len(hs)):
        for i in range(b):
            n = mask[i].sum()
            np.testing.assert_allclose(
                np.asarray(hs[l])[i, :n], out.hidden_states[l].numpy()[i, :n],
                rtol=1e-4, atol=2e-5)


def test_sentence_pool_matches_mask_average(rng):
    b, t, h, smax = 2, 12, 8, 4
    hidden = rng.normal(size=(b, t, h)).astype(np.float32)
    # doc 0: sent0 -> toks 2,3; sent1 -> toks 4,5,6. doc 1: sent0 -> tok 1.
    sent_ids = np.full((b, t), -1, np.int32)
    sent_ids[0, 2:4] = 0
    sent_ids[0, 4:7] = 1
    sent_ids[1, 1] = 0
    got = np.asarray(sentence_pool(jnp.asarray(hidden), jnp.asarray(sent_ids), smax))
    np.testing.assert_allclose(got[0, 0], hidden[0, 2:4].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[0, 1], hidden[0, 4:7].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[1, 0], hidden[1, 1], rtol=1e-5)
    # empty sentences give zero vectors
    assert np.abs(got[0, 2:]).max() == 0.0
    assert np.abs(got[1, 1:]).max() == 0.0


def test_consent_encoder_shapes(tiny_pair, rng):
    hf, cfg, params = tiny_pair
    b, t = 2, 20
    ids = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    sent_ids = np.full((b, t), -1, np.int32)
    sent_ids[:, 3:9] = 0
    sent_ids[:, 9:15] = 1
    enc = ConSentEncoder(cfg, max_sents=6)
    cls, sents = enc.apply({"params": {"bert": params}},
                           jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(sent_ids))
    assert cls.shape == (b, cfg.hidden_size)
    assert sents.shape == (b, 6, cfg.hidden_size)
    # CLS must equal BertModel's position-0 output
    model = BertModel(cfg)
    last, _ = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(cls), np.asarray(last)[:, 0], rtol=1e-6)


def test_bienc_scalar_mix(tiny_pair, rng):
    hf, cfg, params = tiny_pair
    b, t = 2, 10
    ids = rng.integers(0, 128, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    enc = BiEncoder(cfg)
    lw = rng.normal(size=(cfg.num_hidden_layers + 1,)).astype(np.float32)
    cls = enc.apply({"params": {"bert": params, "layer_weights": jnp.asarray(lw)}},
                    jnp.asarray(ids), jnp.asarray(mask))
    # oracle: softmax-weighted CLS over hf hidden states
    with torch.no_grad():
        out = hf(torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long),
                 output_hidden_states=True)
    sm = np.exp(lw) / np.exp(lw).sum()
    want = sum(sm[l] * out.hidden_states[l].numpy()[:, 0] for l in range(len(sm)))
    np.testing.assert_allclose(np.asarray(cls), want, rtol=1e-4, atol=2e-5)


def test_attention_impl_selection_policy():
    """The TPU branches can't run on the CPU CI backend, so pin the policy
    itself: on TPU, 'auto' runs deterministic passes through the p=0 fused
    kernel ('fused_det' -- VMEM-resident, measured 3.1x naive attention
    fwd+bwd at the train shape, RESULTS_r4) and dropout TRAINING passes
    through the fused kernel's hardware-PRNG dropout (the measured-best
    default; 'naive' / --bit-reproducible restores threefry nn.Dropout
    bit streams).  Off-TPU everything is naive (the kernel only lowers on
    TPU)."""
    from aspire_tpu.models.bert import _select_impl
    assert _select_impl("flash", False, 0.1) == "flash"
    assert _select_impl("auto", True, 0.1) == "fused_det"
    assert _select_impl("auto", True, 0.1, on_tpu=False) == "naive"
    # default-fast policy: TPU training-dropout passes run the fused kernel
    assert _select_impl("auto", False, 0.1) == "fused"
    assert _select_impl("auto", False, 0.1, on_tpu=False) == "naive"
    assert _select_impl("auto", False, 0.0) == "fused_det"  # p=0: no rng
    assert _select_impl("naive", True, 0.1) == "naive"
    assert _select_impl("fused", False, 0.1) == "fused"
    assert _select_impl("fused", True, 0.1) == "fused_det"
    assert _select_impl("fused", True, 0.1, on_tpu=False) == "naive"
    assert _select_impl("fused", False, 0.0) == "fused_det"  # p=0: no rng


def test_auto_attention_trains_with_prob_dropout(rng):
    """'auto' TRAINING passes must apply attention-prob dropout on every
    backend (off-TPU naive here; the fused kernel's hardware-PRNG dropout
    on TPU).  With hidden dropout zeroed, a non-deterministic pass differs
    from the deterministic one iff attention-prob dropout is live -- the
    flash path (which skips it) would make them equal."""
    import jax
    cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=512,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.5)
    model = BertModel(cfg)  # attention_impl='auto'
    tok = jnp.asarray(rng.integers(5, 64, (2, 512)).astype(np.int32))
    mask = jnp.ones((2, 512), jnp.int32)
    params = model.init(jax.random.key(0), tok, mask)["params"]
    det, _ = model.apply({"params": params}, tok, mask, deterministic=True)
    tr, _ = model.apply({"params": params}, tok, mask, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(det), np.asarray(tr), atol=1e-6)


def test_pooler_matches_hf(rng):
    """BertPooler == HF pooler_output (tanh(dense(CLS))): the SimCSE encode
    head (reference utils/models.py:330-357)."""
    from aspire_tpu.models.bert import BertPooler
    from aspire_tpu.models.convert import pooler_params_from_hf_state_dict
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(3)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=True).eval()
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_model(hf, cfg)
    pooler_p = pooler_params_from_hf_state_dict(hf.state_dict())
    assert pooler_p is not None
    ids = rng.integers(5, 128, (3, 17)).astype(np.int32)
    mask = (rng.random((3, 17)) > 0.2).astype(np.int32)
    mask[:, 0] = 1
    last, _ = BertModel(cfg).apply({"params": params},
                                   jnp.asarray(ids), jnp.asarray(mask))
    got = np.asarray(BertPooler(cfg).apply({"params": pooler_p}, last))
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long()).pooler_output
    np.testing.assert_allclose(got, want.numpy(), atol=2e-5)
    # checkpoints without the head (aspire encoders) -> None
    hf2 = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    assert pooler_params_from_hf_state_dict(hf2.state_dict()) is None
