"""Streaming batch inference: media files -> transcripts.

The serving-path counterpart of the BASELINE "missing-modality-robust
streaming batch inference" config: a double-buffered pipeline where the
host (native libav batch decoder + landmark scalar logic) prepares batch
N+1 while the device transcribes batch N. Segments missing their video
stream run through the same compiled program with a zeroed video tensor —
the gated cross-attention contributes nothing for them (presence masking
at the feature level), so audio-only and AV segments mix freely in one
batch.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from queue import Queue
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class TranscribeResult:
    id: str
    text: str
    tokens: List[int]
    has_video: bool


class StreamingTranscriber:
    """Batch transcription with host/device overlap.

    ``model``/``variables``: a Whisper(+Flamingo) model and its params.
    Uses greedy decode by default; ``beam_size > 1`` switches to batched
    beam search. All shapes static: audio padded to ``audio_max_length``,
    video padded/truncated to ``video_frames``.
    """

    def __init__(
        self,
        model,
        variables,
        tokenizer,
        audio_max_length: int = 160000,
        video_frames: int = 250,
        crop: int = 88,
        batch_size: int = 8,
        max_new_tokens: int = 64,
        beam_size: int = 1,
        lang: str = "en",
        prefetch: int = 2,
    ):
        import jax
        import jax.numpy as jnp

        from avsl_tpu.decode import beam_search, greedy_decode
        from avsl_tpu.kernels import log_mel_spectrogram

        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.audio_max_length = audio_max_length
        self.video_frames = video_frames
        self.crop = crop
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        self.beam_size = beam_size
        self.lang = lang
        self.prefetch = prefetch
        cfg = model.cfg

        sot = np.asarray(tokenizer.sot_sequence(lang), np.int32)
        self._prompt = np.tile(sot[None], (batch_size, 1))

        @jax.jit
        def run(audio, video, prompt):
            mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
            feats, xv = model.apply(variables, mel, video, method=model.encode)
            cache = model.apply(
                variables, feats, xv, max_new_tokens + prompt.shape[1] + 2,
                method=model.init_decode_cache,
            )

            def step(tok, c):
                return model.apply(
                    variables, tok, None, None, c, method=model.decode
                )

            if beam_size > 1:
                seqs, _ = beam_search(
                    step, cache, jnp.asarray(prompt), beam_size,
                    max_new_tokens, tokenizer.eot,
                )
                return seqs
            return greedy_decode(
                step, cache, jnp.asarray(prompt), max_new_tokens, tokenizer.eot
            )

        self._run = run

    # -- host side -----------------------------------------------------

    def _load_item(self, item: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray, bool]:
        from avsl_tpu.data.audio_segments import load_wav
        from avsl_tpu.data.video_io import load_video_feats
        from avsl_tpu.kernels.logmel import pad_or_trim

        audio = load_wav(item["audio"]) if isinstance(item["audio"], str) else item["audio"]
        audio = np.asarray(pad_or_trim(np.asarray(audio, np.float32), self.audio_max_length))

        video = np.zeros((self.video_frames, self.crop, self.crop, 1), np.float32)
        has_video = False
        path = item.get("lip_video") or item.get("video")
        if path and isinstance(path, str) and os.path.exists(path):
            try:
                feats = load_video_feats(path, image_crop_size=self.crop,
                                         max_frames=self.video_frames)
                video[: len(feats)] = feats
                has_video = True
            except Exception:
                has_video = False
        return audio, video, has_video

    def _prepare_batch(self, items: Sequence[Dict[str, Any]]):
        n = len(items)
        audio = np.zeros((self.batch_size, self.audio_max_length), np.float32)
        video = np.zeros(
            (self.batch_size, self.video_frames, self.crop, self.crop, 1), np.float32
        )
        flags: List[bool] = []
        for i, item in enumerate(items):
            a, v, hv = self._load_item(item)
            audio[i] = a
            video[i] = v
            flags.append(hv)
        return audio, video, flags, n

    # -- public API ----------------------------------------------------

    def transcribe(self, items: Sequence[Dict[str, Any]]) -> List[TranscribeResult]:
        """Items: dicts with 'id', 'audio' (path or array), optional
        'lip_video'/'video' path. Returns per-item results in order."""
        batches = [
            items[i : i + self.batch_size]
            for i in range(0, len(items), self.batch_size)
        ]
        queue: Queue = Queue(maxsize=self.prefetch)

        def producer():
            for chunk in batches:
                queue.put((chunk, self._prepare_batch(chunk)))
            queue.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        special = self.tokenizer.special_token_set
        results: List[TranscribeResult] = []
        while True:
            got = queue.get()
            if got is None:
                break
            chunk, (audio, video, flags, n) = got
            seqs = np.asarray(self._run(audio, video, self._prompt))
            for i in range(n):
                toks = [int(x) for x in seqs[i]]
                text_ids = [x for x in toks if x not in special]
                results.append(
                    TranscribeResult(
                        id=str(chunk[i].get("id", len(results))),
                        text=self.tokenizer.decode(text_ids).strip(),
                        tokens=toks,
                        has_video=flags[i],
                    )
                )
        t.join()
        return results
