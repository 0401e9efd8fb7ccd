"""Real-vocab-scale tokenizer fixture (VERDICT r3 item 6).

Builds a synthetic GPT-2-SHAPED vocab: the full 256-char byte-unicode
alphabet plus ~50k generated merge products, exactly 50257 entries with
a consistent ranked merge list — the same shape as OpenAI's vocab.json +
merges.txt (which cannot be downloaded here). Pins:

* the published Whisper special-token ids land exactly (50257 eot,
  50258 sot, 50259 <|en|>, 50358/50359 translate/transcribe, 50363
  notimestamps) with merges present, through the from_files parser;
* `<laugh>` appends at 50364 and the returned vocab size drives the
  embedding-resize flow (a model built with that vocab emits logits of
  that width — reference whisper_flamingo_ft_ami.py:457-467);
* encode/decode round-trip and actual merge application at this scale.
"""

import json

import numpy as np
import pytest

from avsl_tpu.data.tokenizer import (
    WHISPER_EOT,
    WHISPER_LANG_BASE,
    WHISPER_NO_TIMESTAMPS,
    WHISPER_SOT,
    WHISPER_TRANSCRIBE,
    WHISPER_TRANSLATE,
    BPETokenizer,
    bytes_to_unicode,
)

GPT2_VOCAB = 50257


def _gpt2_shaped_fixture():
    """(vocab dict, merges list) with exactly 50257 entries."""
    alphabet = sorted(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(alphabet)}
    tokens = list(alphabet)
    merges = []
    i = 0
    while len(vocab) < GPT2_VOCAB:
        a = tokens[i % len(tokens)]
        b = tokens[(i * 7 + 1) % len(tokens)]
        i += 1
        t = a + b
        if t in vocab or len(t) > 16:
            continue
        merges.append((a, b))
        vocab[t] = len(vocab)
        tokens.append(t)
    return vocab, merges


@pytest.fixture(scope="module")
def gpt2_tok(tmp_path_factory):
    vocab, merges = _gpt2_shaped_fixture()
    # round-trip through the GPT-2 file format (vocab.json + merges.txt)
    d = tmp_path_factory.mktemp("gpt2_fixture")
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return BPETokenizer.from_dir(str(d))


def test_published_special_ids_with_real_scale_vocab(gpt2_tok):
    tok = gpt2_tok
    assert tok.eot == WHISPER_EOT == 50257
    assert tok.sot == WHISPER_SOT == 50258
    assert tok.special_tokens["<|en|>"] == WHISPER_LANG_BASE == 50259
    assert tok.translate == WHISPER_TRANSLATE == 50358
    assert tok.transcribe == WHISPER_TRANSCRIBE == 50359
    assert tok.no_timestamps == WHISPER_NO_TIMESTAMPS == 50363
    assert tok.sot_sequence("en") == [50258, 50259, 50359, 50363]


def test_roundtrip_and_merges_at_scale(gpt2_tok):
    tok = gpt2_tok
    for text in (
        "the meeting starts now",
        "Umeå östersund — ünïcode résumé",
        "  spaces  and\ttabs kept ",
    ):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert all(0 <= i < GPT2_VOCAB for i in ids)
    # merges actually apply: the first merge product encodes to ONE id
    first = next(iter(tok._ranks))
    merged = first[0] + first[1]
    # guard: pick a merge whose string survives the pre-tokenizer split
    if merged.isalpha():
        one = tok.encode(tok.decode([tok._vocab[merged]]))
        assert len(one) == 1


def test_laugh_append_and_embedding_resize_at_scale(gpt2_tok):
    tok = gpt2_tok
    v0 = tok.vocab_size
    assert v0 == 50364  # 50257 base + 2 + 99 langs + 6 task tokens
    v1 = tok.add_tokens(["<laugh>"])
    assert tok._added["<laugh>"] == 50364
    assert v1 == 50365
    assert tok.add_tokens(["<laugh>"]) == v1  # idempotent

    # the resize flow: the returned size drives the model's vocab, like
    # the reference resizes embeddings after adding <laugh>
    import jax
    import jax.numpy as jnp

    from avsl_tpu.models.factory import build_whisper_flamingo

    model, cfg = build_whisper_flamingo(
        "test", vocab_size=v1, add_gated_x_attn=0,
        use_av_hubert_encoder=False, dtype="float32",
    )
    assert cfg.n_vocab == 50365
    mel = jnp.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), jnp.float32)
    toks = jnp.asarray([[tok.sot, tok._added["<laugh>"]]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), mel, toks)
    logits = model.apply(variables, mel, toks)
    assert logits.shape[-1] == 50365

    # prepare_example carries the new token through the SOT contract
    ex = tok.prepare_example("so <laugh> yes")
    assert ex["dec_input_ids"][:4] == tok.sot_sequence("en")
    assert 50364 in ex["dec_input_ids"]
    assert ex["labels"] == ex["dec_input_ids"][1:] + [tok.eot]
