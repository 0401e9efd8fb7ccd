"""Byte-parity of BPETokenizer against the REAL tiktoken implementation.

The reference tokenizes with ``whisper.tokenizer.get_tokenizer``, which
is a ``tiktoken.Encoding`` over the published Whisper vocab (reference
avsl/whisper_flamingo_ft_ami.py:457-467). That vocab file cannot be
downloaded here (zero egress), but the tiktoken *package* is installed
and accepts explicit ``mergeable_ranks`` — so we can falsify the thing
that actually varies between implementations: the byte-level BPE
algorithm (GPT-2 pre-tokenization regex, merge order, byte alphabet,
special-token splitting). Every test builds a tiktoken.Encoding from the
SAME (vocab, merges) the framework tokenizer loads and asserts
token-by-token id equality on adversarial text. With byte-identical
algorithm + the real vocab/merges files (the from_files load path, also
exercised here via the GPT-2-shaped 50257-entry fixture), encoding is
byte-identical to the reference's tokenizer by construction.

VERDICT r4 item 5.
"""

import pytest

tiktoken = pytest.importorskip("tiktoken")

from avsl_tpu.data.tokenizer import (
    _BPE_PATTERN,
    BPETokenizer,
    bytes_to_unicode,
)

# Adversarial corpus: contractions (the regex's quirkiest branch), runs
# of spaces (the \s+(?!\S) lookahead), unicode outside latin-1 (CJK,
# emoji -> multi-byte UTF-8 through the byte alphabet), digits,
# punctuation runs, tabs/newlines, leading/trailing space (Whisper
# encodes " " + text), and empty-ish inputs.
CORPUS = [
    "hello world",
    " hello world",
    "Hello, World!",
    "I'm sure they're I've you'll he'd we'd ain't",
    "don't DON'T DoN't",
    "  double  and   triple   spaces  ",
    "tabs\tand\nnewlines\r\n mixed \t ",
    "numbers 123 456789 3.14159 1,000,000",
    "punct!!! ??? ... --- ***&&&%%%",
    "mixed2alpha99numeric",
    "café naïve résumé",
    "日本語のテスト",
    "你好世界",
    "emoji \U0001f600 \U0001f680\U0001f30d end",
    "رسالة عربية",
    "MiXeD CaSe WoRdS",
    "trailing space ",
    " ",
    "a",
    "word",
    "supercalifragilisticexpialidocious",
    "the quick brown fox jumps over the lazy dog",
    "THE QUICK BROWN FOX",
    "it's a 'quoted' \"string\" with (brackets) [and] {braces}",
    "url-like http://example.com/path?q=1&r=2",
    "snake_case and kebab-case and camelCase",
    "¡Hola! ¿Cómo estás?",
    "50/50 is 100%",
    "\n\n\n",
    "A  B",
]


def _to_tiktoken(tok: BPETokenizer, name: str) -> "tiktoken.Encoding":
    """Build a tiktoken.Encoding from the framework tokenizer's tables.

    mergeable_ranks maps the token's raw BYTES -> its id; GPT-2-format
    vocabs (and BPETokenizer.train outputs) have ids consistent with
    merge order, which is what tiktoken's rank-based BPE requires.
    """
    byte_dec = {v: k for k, v in bytes_to_unicode().items()}
    ranks = {
        bytes(byte_dec[c] for c in token): tid
        for token, tid in tok._vocab.items()
    }
    return tiktoken.Encoding(
        name=name,
        pat_str=_BPE_PATTERN,
        mergeable_ranks=ranks,
        special_tokens=dict(tok.special_tokens),
    )


@pytest.fixture(scope="module")
def trained():
    """A tokenizer with REAL merges (trained, so merges actually fire on
    the corpus) plus its tiktoken twin."""
    training_text = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "i'm sure they're happy that you'll be there soon ",
        "hello world hello there world peace world news ",
        "numbers 123 456 789 100 2024 ",
        "meeting transcript with laughter and disfluencies um uh ",
    ] * 4
    tok = BPETokenizer.train(training_text, vocab_size=600)
    return tok, _to_tiktoken(tok, "trained600")


@pytest.mark.parametrize("text", CORPUS)
def test_trained_vocab_encode_matches_tiktoken(trained, text):
    tok, enc = trained
    assert tok.encode(text) == enc.encode(text)


@pytest.mark.parametrize("text", CORPUS)
def test_trained_vocab_decode_round_trip(trained, text):
    tok, enc = trained
    ids = enc.encode(text)
    assert tok.decode(ids) == enc.decode(ids) == text


def test_special_tokens_match_tiktoken(trained):
    tok, enc = trained
    text = "<|startoftranscript|><|en|><|transcribe|><|notimestamps|> hello"
    ours = tok.encode(text)
    theirs = enc.encode(text, allowed_special="all")
    assert ours == theirs
    assert ours[:4] == tok.sot_sequence("en")


def test_gpt2_shaped_fixture_matches_tiktoken():
    """Same check at the real vocab's scale/shape (50257 entries) through
    the vocab.json+merges.txt parser — the exact path a real Whisper
    vocab download would take."""
    from tests.test_tokenizer_gpt2_scale import _gpt2_shaped_fixture

    vocab, merges = _gpt2_shaped_fixture()
    tok = BPETokenizer(vocab, merges)
    enc = _to_tiktoken(tok, "gpt2shaped")
    for text in CORPUS:
        assert tok.encode(text) == enc.encode(text), text


def test_prepare_example_matches_tiktoken_convention(trained):
    """The training-example layout: SOT seq + encode(' ' + text); labels
    shifted + EOT (reference whisper_flamingo_ft_ami.py:259-265)."""
    tok, enc = trained
    ex = tok.prepare_example("hello world", lang="en")
    body = enc.encode(" hello world")
    assert ex["dec_input_ids"] == tok.sot_sequence("en") + body
    assert ex["labels"] == ex["dec_input_ids"][1:] + [tok.eot]
