"""Tokenizer + runtime dataset/collator tests."""

import numpy as np
import pytest

from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator
from avsl_tpu.data.tokenizer import ByteTokenizer, get_tokenizer


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello <|en|> world")
    assert tok.decode(ids) == "hello  world"  # special token dropped
    assert tok.decode(tok.encode("héllo wörld")) == "héllo wörld"  # utf-8


def test_byte_tokenizer_special_and_added():
    tok = ByteTokenizer()
    v0 = tok.vocab_size
    v1 = tok.add_tokens(["<laugh>"])
    assert v1 == v0 + 1
    assert tok.add_tokens(["<laugh>"]) == v1  # idempotent
    ids = tok.encode("a <laugh> b")
    assert v0 in ids  # the new token id used
    assert tok.decode(ids) == "a <laugh> b"


def test_sot_sequence_and_prepare():
    tok = ByteTokenizer()
    seq = tok.sot_sequence("en")
    assert seq[0] == tok.sot and seq[2] == tok.transcribe and seq[3] == tok.no_timestamps
    ex = tok.prepare_example("hi there")
    assert ex["labels"] == ex["dec_input_ids"][1:] + [tok.eot]
    assert ex["dec_input_ids"][:4] == seq


def test_get_tokenizer_fallback():
    tok = get_tokenizer(None)
    assert isinstance(tok, ByteTokenizer)
    tok2 = get_tokenizer("/nonexistent/path")
    assert isinstance(tok2, ByteTokenizer)


@pytest.fixture()
def rows():
    rng = np.random.default_rng(0)
    out = []
    for i in range(4):
        out.append(
            {
                "audio": {
                    "array": (0.1 * rng.standard_normal(16000 + 1000 * i)).astype(np.float32),
                    "sampling_rate": 16000,
                },
                "transcript": f"example utterance {i}",
                "duration": 1.0 + 0.0625 * i,
            }
        )
    return out


def test_ami_video_dataset_items(rows):
    tok = ByteTokenizer()
    ds = AmiVideoDataset(rows, tok, audio_max_length=32000, n_mels=80, load_video=False)
    assert len(ds) == 4
    item = ds[0]
    assert item["input_ids"].shape == (80, 200)  # 32000/160
    assert item["labels"][-1] == tok.eot
    assert item["audio_frames"] == 100  # 16000/160
    assert ds.audio_length(3) == int(1.1875 * 16000)


def test_collator_padding(rows):
    tok = ByteTokenizer()
    ds = AmiVideoDataset(rows, tok, audio_max_length=32000, load_video=False)
    items = [ds[i] for i in range(4)]
    # unequal label lengths pad with -100 / eot
    batch = WhisperVideoCollator(eot_id=tok.eot)(items)
    assert batch["input_ids"].shape == (4, 80, 200)
    assert batch["labels"].shape == batch["dec_input_ids"].shape
    lens = [len(it["labels"]) for it in items]
    row = batch["labels"][int(np.argmin(lens))]
    assert (row[min(lens):] == -100).all()

    capped = WhisperVideoCollator(eot_id=tok.eot, max_label_len=10)(items)
    assert capped["labels"].shape[1] == 10


def test_collator_video_padding(rows):
    tok = ByteTokenizer()
    items = []
    for i, r in enumerate(rows):
        ds = AmiVideoDataset([r], tok, audio_max_length=16000, load_video=False)
        it = ds[0]
        it["video"] = np.zeros((5 + i, 8, 8, 1), np.float32)
        items.append(it)
    batch = WhisperVideoCollator(eot_id=tok.eot)(items)
    assert batch["video"].shape == (4, 8, 8, 8, 1)
    assert batch["video_mask"][0, 5:].sum() == 0
    assert batch["video_mask"][3].all()


def test_avhubert_dataset_modality_dropout(tmp_path):
    import scipy.io.wavfile as wavfile

    from avsl_tpu.data.runtime import AVHubertDataset

    sr = 16000
    wav_path = str(tmp_path / "a.wav")
    wavfile.write(wav_path, sr, (np.random.default_rng(0).normal(0, 0.1, sr) * 32767).astype(np.int16))
    rows = [{"audio": wav_path, "transcript": f"t{i}"} for i in range(30)]

    ds = AVHubertDataset(rows, audio_drop_prob=0.5, video_drop_prob=0.5, train=True)
    a_pres, v_pres = [], []
    for i in range(30):
        item = ds[i]
        assert item["audio_feats"].shape[1] == 104
        assert item["video_feats"].shape[1:] == (88, 88, 1)
        # at-least-one-modality guarantee
        assert item["audio_present"] + item["video_present"] >= 1.0
        a_pres.append(item["audio_present"])
        v_pres.append(item["video_present"])
        if item["audio_present"] == 0.0:
            assert not item["audio_feats"].any()
    # no video files in this fixture: video always absent, so the
    # at-least-one guarantee must keep audio present every time
    assert min(a_pres) == 1.0
    assert max(v_pres) == 0.0

    # eval mode: no dropout
    ds_eval = AVHubertDataset(rows, audio_drop_prob=0.9, video_drop_prob=0.9, train=False)
    assert all(ds_eval[i]["audio_present"] == 1.0 for i in range(5))


# ---------------------------------------------------------------------------
# BPE tokenizer (from-scratch byte-level BPE, Whisper layout)
# ---------------------------------------------------------------------------

from avsl_tpu.data.tokenizer import (  # noqa: E402
    BPETokenizer,
    WHISPER_ALL_LANGS,
    WHISPER_EOT,
    WHISPER_LANG_BASE,
    WHISPER_NO_TIMESTAMPS,
    WHISPER_SOT,
    WHISPER_TRANSCRIBE,
    WHISPER_TRANSLATE,
    bytes_to_unicode,
)

_CORPUS = [
    "the meeting starts now",
    "so the the remote control design",
    "that is a good point about the design",
    "we need to decide on the remote",
    "I think the rubber buttons are better",
]


@pytest.fixture(scope="module")
def bpe():
    return BPETokenizer.train(_CORPUS, vocab_size=300)


def test_bpe_roundtrip(bpe):
    for text in _CORPUS + ["unseen wörds still rönd-trip!", "  spaces  kept "]:
        assert bpe.decode(bpe.encode(text)) == text


def test_bpe_actually_merges(bpe):
    # "the" is the most frequent word: must encode to fewer ids than chars
    ids = bpe.encode(" the")
    assert len(ids) < 4
    assert bpe.decode(ids) == " the"


def test_bpe_save_load_roundtrip(bpe, tmp_path):
    bpe.save(str(tmp_path))
    loaded = BPETokenizer.from_dir(str(tmp_path))
    for text in _CORPUS:
        assert loaded.encode(text) == bpe.encode(text)
    assert loaded.vocab_size == bpe.vocab_size


def test_bpe_get_tokenizer_factory(bpe, tmp_path):
    bpe.save(str(tmp_path))
    tok = get_tokenizer(str(tmp_path))
    assert isinstance(tok, BPETokenizer)
    assert tok.decode(tok.encode("hello world")) == "hello world"


def test_bpe_whisper_special_ids_at_gpt2_size():
    """With a 50257-entry base vocab the special ids match published
    Whisper ids (the real-checkpoint parity contract)."""
    alphabet = sorted(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(alphabet)}
    # pad with synthetic entries up to GPT-2's vocab size
    for i in range(len(vocab), 50257):
        vocab[f"<pad{i}>"] = i
    tok = BPETokenizer(vocab, merges=[])
    assert tok.eot == WHISPER_EOT == 50257
    assert tok.sot == WHISPER_SOT == 50258
    assert tok.special_tokens["<|en|>"] == WHISPER_LANG_BASE == 50259
    assert tok.special_tokens[f"<|{WHISPER_ALL_LANGS[-1]}|>"] == 50357
    assert tok.translate == WHISPER_TRANSLATE == 50358
    assert tok.transcribe == WHISPER_TRANSCRIBE == 50359
    assert tok.no_timestamps == WHISPER_NO_TIMESTAMPS == 50363


def test_bpe_laugh_token_and_sot_contract(bpe):
    v0 = bpe.vocab_size
    v1 = bpe.add_tokens(["<laugh>"])
    assert v1 == v0 + 1 and bpe.add_tokens(["<laugh>"]) == v1
    ids = bpe.encode("a <laugh> b")
    assert v0 in ids
    assert bpe.decode(ids) == "a <laugh> b"
    ex = bpe.prepare_example("the design <laugh>")
    assert ex["dec_input_ids"][:4] == bpe.sot_sequence("en")
    assert ex["labels"] == ex["dec_input_ids"][1:] + [bpe.eot]


def test_bucket_overflow_pads_at_least_item_length():
    """Items longer than the last boundary must land in overflow buckets
    padded to >= their length (the top regular bucket would silently
    truncate their video frames downstream)."""
    import numpy as np

    from avsl_tpu.data.batching import LengthBucketBatcher

    lengths = [50, 250, 120, 430]
    b = LengthBucketBatcher(lengths, batch_bins=10_000,
                            boundaries=[100, 200], num_shards=1)
    seen = {}
    for idx, padded in b.batches(shuffle=False):
        for i in idx:
            seen[int(i)] = padded
    assert set(seen) == {0, 1, 2, 3}
    for i, L in enumerate(lengths):
        assert seen[i] >= L, (i, L, seen[i])
    assert seen[1] == 400 and seen[3] == 600  # multiples of the top boundary


def test_modality_drop_resamples_across_epochs(tmp_path):
    """set_epoch must change which items drop a modality — a fixed
    (seed, idx) rng would drop the SAME items' audio all run long."""
    import numpy as np

    from avsl_tpu.data.audio_segments import write_wav
    from avsl_tpu.data.runtime import AVHubertDataset

    from avsl_tpu.data.video_io import write_video_frames

    sr = 16000
    wav = str(tmp_path / "x.wav")
    write_wav(wav, (0.1 * np.sin(
        2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32))
    lip = str(tmp_path / "x-lip.mp4")
    write_video_frames(
        lip,
        np.random.default_rng(0).integers(0, 255, (25, 96, 96)).astype(np.uint8),
        fps=25,
    )
    # both modalities present, else the at-least-one fallback pins audio
    rows = [{"audio": wav, "lip_video": lip} for _ in range(24)]
    ds = AVHubertDataset(rows, train=True, audio_drop_prob=0.5,
                         video_drop_prob=0.0, seed=3)

    def drops(epoch):
        ds.set_epoch(epoch)
        return [ds[i]["audio_present"] for i in range(len(ds))]

    d0, d1 = drops(0), drops(1)
    assert d0 != d1
    assert drops(0) == d0  # deterministic per (seed, epoch)


def test_pcm_to_float_normalizes_all_widths():
    import numpy as np

    from avsl_tpu.data.audio_segments import pcm_to_float

    assert abs(float(pcm_to_float(np.asarray([16384], np.int16))) - 0.5) < 1e-6
    assert abs(float(pcm_to_float(np.asarray([2**30], np.int32))) - 0.5) < 1e-6
    assert abs(float(pcm_to_float(np.asarray([192], np.uint8))) - 0.5) < 1e-6
    out = pcm_to_float(np.asarray([[0.5, 0.5]], np.float32).T.repeat(2, 1))
    assert out.dtype == np.float32


def test_byte_tokenizer_full_lang_set_and_clear_error():
    from avsl_tpu.data.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    assert tok.sot_sequence("pl")[1] == tok.special_tokens["<|pl|>"]
    import pytest

    with pytest.raises(ValueError, match="unknown language"):
        tok.sot_sequence("xx")
