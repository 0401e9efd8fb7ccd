"""Tokenizers with the Whisper special-token contract.

The reference tokenizes with the Whisper BPE tokenizer plus a custom
``<laugh>`` token (avsl/whisper_flamingo_ft_ami.py:457-467, 259-265 in
/root/reference: SOT sequence ``[sot, <|lang|>, transcribe,
notimestamps]`` + BPE of " " + text; labels are the shifted sequence +
EOT). This environment has no network, so the BPE merges cannot be
downloaded; the framework defines the *interface* plus two backends:

* :class:`ByteTokenizer` — self-contained byte-level tokenizer (ids 0-255
  are raw bytes) with the standard Whisper special-token ids appended
  above a configurable base. Fully offline; used for tests and
  training-from-scratch runs.
* :class:`HFWhisperTokenizer` — adapter over a locally available
  ``transformers`` WhisperTokenizer (pass a local path; never downloads).

Both expose: encode/decode, ``sot_sequence(lang)``, ``eot``/``sot``/
``transcribe``/``no_timestamps`` ids, ``special_tokens`` mapping,
``add_tokens`` (returns new vocab size for embedding resize), and
``special_token_set`` for decode-time stripping.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

# Published Whisper multilingual special-token ids (for checkpoint parity).
WHISPER_SOT = 50258
WHISPER_EOT = 50257
WHISPER_TRANSLATE = 50358
WHISPER_TRANSCRIBE = 50359
WHISPER_NO_TIMESTAMPS = 50363
WHISPER_LANG_BASE = 50259  # <|en|> is 50259
WHISPER_LANGS = ("en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr")


class Tokenizer:
    """Interface: see module docstring."""

    eot: int
    sot: int
    transcribe: int
    no_timestamps: int
    special_tokens: Dict[str, int]

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError

    @property
    def special_token_set(self) -> set:
        return set(self.special_tokens.values())

    def sot_sequence(self, lang: str = "en") -> List[int]:
        return [
            self.sot,
            self.special_tokens[f"<|{lang}|>"],
            self.transcribe,
            self.no_timestamps,
        ]

    def prepare_example(self, text: str, lang: str = "en") -> Dict[str, List[int]]:
        """Reference convention: dec_input_ids = SOT seq + encode(" "+text);
        labels = dec_input_ids[1:] + [eot]."""
        dec = self.sot_sequence(lang) + self.encode(" " + text.strip())
        labels = dec[1:] + [self.eot]
        return {"dec_input_ids": dec, "labels": labels}


class ByteTokenizer(Tokenizer):
    """Byte-level tokenizer with Whisper-style special tokens.

    ids [0, 256) are raw bytes; special tokens and user tokens follow."""

    def __init__(self, langs: Sequence[str] = WHISPER_LANGS):
        self._base = 256
        self.special_tokens: Dict[str, int] = {}
        nid = self._base
        for name in ("<|endoftext|>", "<|startoftranscript|>"):
            self.special_tokens[name] = nid
            nid += 1
        for lang in langs:
            self.special_tokens[f"<|{lang}|>"] = nid
            nid += 1
        for name in ("<|translate|>", "<|transcribe|>", "<|notimestamps|>"):
            self.special_tokens[name] = nid
            nid += 1
        self.eot = self.special_tokens["<|endoftext|>"]
        self.sot = self.special_tokens["<|startoftranscript|>"]
        self.translate = self.special_tokens["<|translate|>"]
        self.transcribe = self.special_tokens["<|transcribe|>"]
        self.no_timestamps = self.special_tokens["<|notimestamps|>"]
        self._added: Dict[str, int] = {}
        self._next_id = nid

    @property
    def vocab_size(self) -> int:
        return self._next_id

    def add_tokens(self, tokens: Iterable[str]) -> int:
        """Register user tokens (e.g. ``<laugh>``); returns new vocab size
        (the embedding-resize contract)."""
        for tok in tokens:
            if tok not in self._added and tok not in self.special_tokens:
                self._added[tok] = self._next_id
                self._next_id += 1
        return self.vocab_size

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        i = 0
        # greedy match added/special tokens first (longest token wins)
        markers = {**self._added, **self.special_tokens}
        names = sorted(markers, key=len, reverse=True)
        while i < len(text):
            matched = False
            for name in names:
                if text.startswith(name, i):
                    out.append(markers[name])
                    i += len(name)
                    matched = True
                    break
            if not matched:
                out.extend(text[i].encode("utf-8"))
                i += 1
        return out

    def decode(self, ids: Sequence[int]) -> str:
        rev_special = {v: k for k, v in self.special_tokens.items()}
        rev_added = {v: k for k, v in self._added.items()}
        parts: List[str] = []
        byte_buf: List[int] = []

        def flush():
            if byte_buf:
                parts.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if 0 <= i < self._base:
                byte_buf.append(i)
            elif i in rev_added:
                flush()
                parts.append(rev_added[i])
            elif i in rev_special:
                flush()  # special tokens are dropped from text output
            else:
                flush()
        flush()
        return "".join(parts)


class HFWhisperTokenizer(Tokenizer):
    """Adapter over a *local* transformers WhisperTokenizer."""

    def __init__(self, local_path: str, lang: str = "en", task: str = "transcribe"):
        from transformers import WhisperTokenizer

        self._tok = WhisperTokenizer.from_pretrained(
            local_path, local_files_only=True, language=lang, task=task
        )
        conv = self._tok.convert_tokens_to_ids
        self.special_tokens = {
            t: conv(t)
            for t in self._tok.all_special_tokens
            if conv(t) is not None
        }
        for code in WHISPER_LANGS:
            tid = conv(f"<|{code}|>")
            if tid is not None and tid != self._tok.unk_token_id:
                self.special_tokens[f"<|{code}|>"] = tid
        self.eot = conv("<|endoftext|>")
        self.sot = conv("<|startoftranscript|>")
        self.transcribe = conv("<|transcribe|>")
        self.no_timestamps = conv("<|notimestamps|>")

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def add_tokens(self, tokens: Iterable[str]) -> int:
        self._tok.add_tokens(list(tokens))
        return len(self._tok)

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)


def get_tokenizer(
    name_or_path: Optional[str] = None, lang: str = "en"
) -> Tokenizer:
    """Factory: local HF tokenizer when a path is given, else ByteTokenizer."""
    if name_or_path:
        import os

        if os.path.exists(name_or_path):
            return HFWhisperTokenizer(name_or_path, lang=lang)
    return ByteTokenizer()
