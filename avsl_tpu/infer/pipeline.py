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
    # mean token log-probability of the generated sequence (greedy) or
    # the beam's length-normalized score — serving's low-confidence flag
    avg_logprob: float = 0.0
    # word-level timestamps (cross-attention DTW) when the transcriber
    # was built with word_timestamps=True: [{"word", "start_s", "end_s"}]
    words: Optional[List[dict]] = None


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
        raw_video_hw: Tuple[int, int] = (288, 352),
        raw_lip_mode: str = "host_refined",
        quantize: Optional[str] = None,
        kv_int8: bool = False,
        mesh: Optional[Any] = None,
        temperature_fallback: Sequence[float] = (),
        logprob_threshold: float = -1.0,
        compression_ratio_threshold: float = 2.4,
        word_timestamps: bool = False,
        draft_model: Optional[Any] = None,
        draft_variables: Optional[Any] = None,
        spec_k: int = 4,
        boost_phrases: Optional[Sequence[str]] = None,
        boost_weight: float = 4.0,
    ):
        import jax
        import jax.numpy as jnp

        from avsl_tpu.decode import (
            beam_search,
            greedy_decode_scored,
            sampled_decode_scored,
        )
        from avsl_tpu.decode.speculative import speculative_greedy_decode
        from avsl_tpu.kernels import log_mel_spectrogram

        # model.init returns EVERY collection it touched, including any
        # alignment/intermediates sow leftovers — those are dead weight
        # (stale [B,H,Q,K] tensors uploaded to HBM) and would be appended
        # to by the alignment pass; only real variable collections ride
        variables = {
            k: v for k, v in variables.items()
            if k not in ("alignment", "intermediates")
        }

        # Whisper-serving quality loop: retry low-confidence / repetitive
        # decodes at increasing temperatures. TPU-shaped: ONE extra
        # compiled program (temperature is a traced scalar), re-launched
        # whole-batch at most len(temperature_fallback) times; per-item
        # adoption happens on the host.
        self.temperature_fallback = tuple(float(t) for t in temperature_fallback)
        self.logprob_threshold = float(logprob_threshold)
        self.compression_ratio_threshold = float(compression_ratio_threshold)
        if self.temperature_fallback and beam_size > 1:
            raise ValueError(
                "temperature_fallback composes with greedy decode only "
                "(the beam already explores alternatives)"
            )
        self._fallback_calls = 0
        # speculative telemetry (filled by _dispatch when a draft runs)
        self._spec_batches = 0
        self._spec_accept_sum = 0.0
        self._spec_rounds_sum = 0

        # speculative decoding (decode/speculative.py): an audio-only draft
        # model proposes spec_k tokens per target forward; token-exact vs
        # plain greedy, so it composes with the confidence gate and the
        # temperature-fallback retries unchanged
        if (draft_model is None) != (draft_variables is None):
            raise ValueError("draft_model and draft_variables go together")
        if draft_model is not None and beam_size > 1:
            raise ValueError("speculative decoding composes with greedy only")
        self.spec_k = int(spec_k)
        if draft_model is not None and self.spec_k < 1:
            # fail at construction like the adjacent pairing checks, not
            # minutes later at first-transcribe trace time
            raise ValueError(f"spec_k must be >= 1, got {spec_k}")
        self.draft_model = draft_model
        if draft_variables is not None:
            draft_variables = {
                k: v for k, v in draft_variables.items()
                if k not in ("alignment", "intermediates")
            }

        # multi-chip serving: shard the weights over the mesh's model
        # axis (Megatron col/row rules, core/partitioning.py) and the
        # batch over its data axis. Decode is HBM-bandwidth bound (every
        # decoder weight is re-read per token), so tp splits the per-chip
        # weight traffic tp-ways — XLA inserts the all-reduces between
        # column- and row-parallel matmuls, same rules as training.
        self.mesh = mesh
        if mesh is not None:
            if quantize is not None:
                raise ValueError(
                    "quantize + mesh unsupported: int8 halves single-chip "
                    "HBM traffic, tp splits it across chips — pick one "
                    "(QTensor leaves would silently replicate under the "
                    "kernel-path sharding rules)"
                )
            from avsl_tpu.core.mesh import DATA_AXIS
            from avsl_tpu.core.partitioning import shard_state

            n_data = mesh.shape.get(DATA_AXIS, 1)
            if batch_size % max(n_data, 1):
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"data axis ({n_data})"
                )
            variables = shard_state(variables, mesh)
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            self._repl_sharding = NamedSharding(mesh, PartitionSpec())
            if draft_variables is not None:
                # the draft is small by design: replicate it (its decode
                # is already cheap; splitting it tp-ways would add
                # collectives for no HBM relief). The spec loop's
                # per-sequence scatter writes and index vectors shard on
                # the batch axis with the cache; parity with the
                # single-device program is locked by tests/test_speculative.py
                # (test_transcriber_draft_under_tp_mesh_matches_single_device)
                draft_variables = jax.device_put(
                    draft_variables, self._repl_sharding
                )

        # weight-only int8: the resident/uploaded weight form is int8 +
        # per-channel scales; dequantization happens INSIDE the jitted
        # program, so HBM holds half the bytes and the decode loop (which
        # re-reads every decoder weight per token) streams int8
        # (models/quant.py). None keeps the float weights as passed.
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize {quantize!r} (expected None or 'int8')")
        self.quantize = quantize
        if quantize == "int8":
            from avsl_tpu.models.quant import dequantize_tree, quantize_tree

            variables = quantize_tree(variables)
            self._dequantize = lambda v: dequantize_tree(v)
        else:
            self._dequantize = lambda v: v
        # int8 KV cache (models/quant.quantize_kv_cache): compress the
        # precomputed cross-attention / xv K/V the decode loop re-reads
        # per token; orthogonal to weight quantization and to the mesh
        # (the cache is a per-batch activation, not a sharded param)
        self.kv_int8 = bool(kv_int8)
        if self.kv_int8:
            from avsl_tpu.models.quant import quantize_kv_cache

            self._compress_kv = quantize_kv_cache
        else:
            self._compress_kv = lambda c: c
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
        # raw-closeup crop source: "host_refined" (default) lip-crops with
        # the SAME RefinedMouthTracker the offline preprocessing uses, so
        # a segment gets the same crop at serving time as at training-data
        # time (runs on the producer thread, overlapped with device work);
        # "device" uses the on-device motion-detector frontend — lower
        # host latency but an unrefined crop distribution (SERVING.md)
        if raw_lip_mode not in ("host_refined", "device"):
            raise ValueError(f"raw_lip_mode {raw_lip_mode!r}")
        self.raw_lip_mode = raw_lip_mode
        cfg = model.cfg

        sot = np.asarray(tokenizer.sot_sequence(lang), np.int32)
        self._prompt = np.tile(sot[None], (batch_size, 1))

        # contextual biasing (decode/biasing.py): user phrases compile to
        # a token-trie whose score adjustment folds into every decode
        # argmax/top-k/sample. Not composed with speculative decoding —
        # the draft-verify equivalence is vs UNbiased greedy.
        self.boost_phrases = tuple(boost_phrases or ())
        biasing = None
        if self.boost_phrases:
            if draft_model is not None:
                raise ValueError(
                    "boost_phrases does not compose with speculative "
                    "decoding (the draft-verify loop is token-exact vs "
                    "unbiased greedy) — drop draft_model or the boost"
                )
            from avsl_tpu.decode.biasing import (
                build_biasing_trie,
                encode_phrases,
            )

            biasing = build_biasing_trie(
                encode_phrases(tokenizer, self.boost_phrases),
                cfg.n_vocab,
                weight=float(boost_weight),
            )
        self._biasing = biasing

        qvariables = self.variables

        @jax.jit
        def run(audio, video, prompt):
            variables = self._dequantize(qvariables)
            mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
            feats, xv = model.apply(variables, mel, video, method=model.encode)
            cache_len = max_new_tokens + prompt.shape[1] + (
                self.spec_k + 1 if draft_model is not None else 2
            )
            cache = self._compress_kv(model.apply(
                variables, feats, xv, cache_len,
                method=model.init_decode_cache,
            ))

            def step(tok, c):
                return model.apply(
                    variables, tok, None, None, c, method=model.decode
                )

            if beam_size > 1:
                return beam_search(
                    step, cache, jnp.asarray(prompt), beam_size,
                    max_new_tokens, tokenizer.eot, biasing=biasing,
                )
            if draft_model is not None:
                dmel = log_mel_spectrogram(audio, n_mels=draft_model.cfg.n_mels)
                dfeats, _ = draft_model.apply(
                    draft_variables, dmel, None, method=draft_model.encode
                )
                dcache = draft_model.apply(
                    draft_variables, dfeats, None, cache_len,
                    method=draft_model.init_decode_cache,
                )

                def dstep(tok, c):
                    return draft_model.apply(
                        draft_variables, tok, None, None, c,
                        method=draft_model.decode,
                    )

                res = speculative_greedy_decode(
                    step, dstep, cache, dcache, jnp.asarray(prompt),
                    max_new_tokens, tokenizer.eot, k=self.spec_k,
                )
                # 4-tuple: acceptance/rounds ride out of the jit so
                # serving can watch draft quality drift (/stats)
                return res.tokens, res.avg_logprob, res.accept_rate, res.rounds
            return greedy_decode_scored(
                step, cache, jnp.asarray(prompt), max_new_tokens,
                tokenizer.eot, biasing=biasing,
            )

        self._run = run

        @jax.jit
        def run_sampled(audio, video, prompt, temperature, rng):
            variables = self._dequantize(qvariables)
            mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
            feats, xv = model.apply(variables, mel, video, method=model.encode)
            cache = self._compress_kv(model.apply(
                variables, feats, xv, max_new_tokens + prompt.shape[1] + 2,
                method=model.init_decode_cache,
            ))

            def step(tok, c):
                return model.apply(
                    variables, tok, None, None, c, method=model.decode
                )

            return sampled_decode_scored(
                step, cache, jnp.asarray(prompt), max_new_tokens,
                tokenizer.eot, temperature, rng, biasing=biasing,
            )

        self._run_sampled = run_sampled

        # word timestamps (decode/word_timestamps.py): ONE teacher-forced
        # alignment program over the decoded tokens; the attention layer
        # materializes + sows cross-attn weights only because
        # "intermediates" is mutable here — the decode programs above
        # keep the fused path
        self.word_timestamps = bool(word_timestamps)
        if self.word_timestamps:

            @jax.jit
            def run_align(audio, video, tokens):
                variables = self._dequantize(qvariables)
                mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
                _, inter = model.apply(
                    variables, mel, tokens, video=video,
                    mutable=["alignment"],
                )
                return inter["alignment"]

            self._run_align = run_align

        # raw-closeup support: items carrying 'video' (an unprocessed
        # closeup mp4) instead of 'lip_video' go through the on-device
        # staged lip frontend (detection -> trajectory -> closed-form warp
        # coords -> chunked separable sampling). Stages are jitted
        # SEPARATELY — on tunneled TPU runtimes fused frontend programs
        # compile pathologically and degrade the session (see
        # kernels/lip_pipeline.make_staged_lip_frontend).
        self.raw_video_hw = raw_video_hw
        from avsl_tpu.kernels.lip_pipeline import make_staged_lip_frontend

        stages = make_staged_lip_frontend(video_frames)
        self._j_sub = jax.jit(stages["subsample"])
        self._j_traj = jax.jit(stages["traj"])
        self._j_coords = jax.jit(stages["coords_from_traj"])
        self._j_sample = jax.jit(stages["sample"])

        def lip_from_raw(clips_u8, n_frames):
            tr, fw, _ok = self._j_traj(self._j_sub(clips_u8))
            lip96 = self._j_sample(clips_u8, *self._j_coords(tr, fw))
            off = (96 - self.crop) // 2
            lip = lip96[:, :, off: off + self.crop, off: off + self.crop, None]
            lip = (lip / 255.0 - 0.421) / 0.165  # load_video_feats norm
            # zero-pad tail frames EXACTLY like the lip_video path (its
            # zeros buffer stays 0.0 past len(feats)); without this the
            # uint8-zero pad frames would normalize to -2.55
            t_idx = jnp.arange(lip.shape[1])[None, :, None, None, None]
            return jnp.where(t_idx < n_frames[:, None, None, None, None], lip, 0.0)

        self._lip_from_raw = lip_from_raw

    def _place(self, audio, video):
        """Under a mesh, commit the batch to the data axis and the prompt
        replicated (jit then compiles the SPMD program against those
        placements); single-device passes through."""
        if self.mesh is None:
            return audio, video, self._prompt
        import jax

        return (
            jax.device_put(audio, self._batch_sharding),
            jax.device_put(video, self._batch_sharding),
            jax.device_put(self._prompt, self._repl_sharding),
        )

    def _retry_mask(self, seqs: np.ndarray, scores: np.ndarray) -> np.ndarray:
        """Per-item quality gate: confidence below logprob_threshold or
        compressible (repetitive) text above compression_ratio_threshold."""
        from avsl_tpu.decode import compression_ratio

        special = self.tokenizer.special_token_set
        need = scores < self.logprob_threshold
        for i in range(seqs.shape[0]):
            if need[i]:
                continue
            text = self.tokenizer.decode(
                [int(x) for x in seqs[i] if int(x) not in special]
            )
            if compression_ratio(text) > self.compression_ratio_threshold:
                need[i] = True
        return need

    def _dispatch(self, audio, video):
        """Run the compiled program; with temperature_fallback set, retry
        failing items (whole-batch relaunches of ONE sampled program with
        temperature as a traced scalar), adopting a retry per item when it
        passes the gate — or, at the final temperature, when it scores
        better than what we have."""
        placed = self._place(audio, video)
        out = self._run(*placed)
        if len(out) == 4:  # speculative program: record draft telemetry
            seqs, scores, acc, rounds = out
            self._spec_batches += 1
            self._spec_accept_sum += float(acc)
            self._spec_rounds_sum += int(rounds)
        else:
            seqs, scores = out
        if not self.temperature_fallback:
            return seqs, scores
        import jax

        seqs, scores = np.asarray(seqs), np.asarray(scores)
        need = self._retry_mask(seqs, scores)
        self._fallback_calls += 1
        last = len(self.temperature_fallback) - 1
        for k, temp in enumerate(self.temperature_fallback):
            if not need.any():
                break
            rng = jax.random.fold_in(
                jax.random.PRNGKey(1234), self._fallback_calls * 31 + k
            )
            s2, sc2 = self._run_sampled(*placed, temp, rng)
            s2, sc2 = np.asarray(s2), np.asarray(sc2)
            passes = ~self._retry_mask(s2, sc2)
            adopt = need & (passes | ((k == last) & (sc2 > scores)))
            seqs = np.where(adopt[:, None], s2, seqs)
            scores = np.where(adopt, sc2, scores)
            need = need & ~(adopt & passes)
        return seqs, scores

    def spec_stats(self) -> Optional[Dict[str, float]]:
        """Draft-quality telemetry: mean acceptance rate and verify
        rounds per batch since start. None when no speculative batch has
        run. A production acceptance rate drifting down means the draft
        no longer matches the traffic — time to re-distill
        (cli.distill)."""
        if not self._spec_batches:
            return None
        return {
            "batches": self._spec_batches,
            "mean_accept_rate": self._spec_accept_sum / self._spec_batches,
            "mean_verify_rounds": self._spec_rounds_sum / self._spec_batches,
        }

    # -- host side -----------------------------------------------------

    def _load_item(self, item: Dict[str, Any]):
        """-> (audio, lip_feats | None, raw_clip | None, n_raw_frames,
        has_video, n_audio_samples).

        ``lip_video``: an already-extracted 96x96 lip clip (reference
        runtime contract). ``video``: a RAW closeup — decoded to grayscale
        at ``raw_video_hw`` and lip-cropped ON DEVICE per batch."""
        from avsl_tpu.data.audio_segments import load_wav
        from avsl_tpu.data.video_io import load_video_feats, read_video_frames
        from avsl_tpu.kernels.logmel import pad_or_trim

        audio = load_wav(item["audio"]) if isinstance(item["audio"], str) else item["audio"]
        n_samples = min(len(audio), self.audio_max_length)
        audio = np.asarray(pad_or_trim(np.asarray(audio, np.float32), self.audio_max_length))

        lf = item.get("lip_feats")
        if lf is not None:  # precomputed features (long-form window slices)
            feats = np.asarray(lf, np.float32)[: self.video_frames]
            video = np.zeros(
                (self.video_frames, self.crop, self.crop, 1), np.float32
            )
            video[: len(feats)] = feats
            return audio, video, None, 0, True, n_samples

        lip = item.get("lip_video")
        if lip and isinstance(lip, str) and os.path.exists(lip):
            try:
                feats = load_video_feats(lip, image_crop_size=self.crop,
                                         max_frames=self.video_frames)
                video = np.zeros(
                    (self.video_frames, self.crop, self.crop, 1), np.float32
                )
                video[: len(feats)] = feats
                return audio, video, None, 0, True, n_samples
            except Exception:
                pass  # corrupt lip clip: fall through to the raw closeup

        raw = item.get("video")
        if raw and isinstance(raw, str) and os.path.exists(raw):
            try:
                frames = read_video_frames(
                    raw, grayscale=True, max_frames=self.video_frames
                )
                if self.raw_lip_mode == "host_refined":
                    feats = self._host_refined_lip(frames)
                    if feats is not None:
                        video = np.zeros(
                            (self.video_frames, self.crop, self.crop, 1),
                            np.float32,
                        )
                        video[: len(feats)] = feats
                        return audio, video, None, 0, True, n_samples
                    # detector found nothing: fall through to device crop
                h, w = self.raw_video_hw
                if frames.shape[1:] != (h, w):
                    import cv2

                    frames = np.stack(
                        [cv2.resize(f, (w, h)) for f in frames]
                    )
                clip = np.zeros((self.video_frames, h, w), np.uint8)
                clip[: len(frames)] = frames.astype(np.uint8)
                return audio, None, clip, len(frames), True, n_samples
            except Exception:
                pass
        return audio, None, None, 0, False, n_samples

    def _host_refined_lip(self, frames: np.ndarray):
        """Training-parity lip crop: the offline preprocessing pipeline
        (RefinedMouthTracker + extract_lip_clip) applied at serving time,
        then the load_video_feats crop+normalization."""
        from avsl_tpu.data.lip_refine import RefinedMouthTracker
        from avsl_tpu.data.lip_roi import extract_lip_clip

        if not hasattr(self, "_host_detector"):
            self._host_detector = RefinedMouthTracker()
        clip = extract_lip_clip(frames, self._host_detector(frames))
        if clip is None:
            return None
        clip = clip[: self.video_frames]
        off = (96 - self.crop) // 2
        lip = clip[:, off: off + self.crop, off: off + self.crop, None]
        return (lip.astype(np.float32) / 255.0 - 0.421) / 0.165

    def _prepare_batch(self, items: Sequence[Dict[str, Any]]):
        n = len(items)
        audio = np.zeros((self.batch_size, self.audio_max_length), np.float32)
        video = np.zeros(
            (self.batch_size, self.video_frames, self.crop, self.crop, 1), np.float32
        )
        h, w = self.raw_video_hw
        raw = None
        raw_mask = np.zeros((self.batch_size,), bool)
        raw_frames = np.zeros((self.batch_size,), np.int32)
        flags: List[bool] = []
        n_samples = np.zeros((self.batch_size,), np.int64)
        for i, item in enumerate(items):
            a, v, rc, nf, hv, ns = self._load_item(item)
            audio[i] = a
            n_samples[i] = ns
            if v is not None:
                video[i] = v
            if rc is not None:
                if raw is None:
                    raw = np.zeros((self.batch_size, self.video_frames, h, w), np.uint8)
                raw[i] = rc
                raw_mask[i] = True
                raw_frames[i] = nf
            flags.append(hv)
        return audio, video, raw, raw_mask, raw_frames, flags, n, n_samples

    def _word_timestamps(self, audio, video, seqs: np.ndarray,
                         n_samples: np.ndarray) -> List[List[dict]]:
        """Teacher-force the decoded sequences back through the model to
        capture cross-attention, DTW-align, and group into words. The
        encoder emits one frame per 20 ms (conv stride 2 over 10 ms mel
        hops) -> frame_rate 50 Hz; per-item true frames crop the padding.
        Trailing EOT padding rows are skipped by the word grouper."""
        from avsl_tpu.decode.word_timestamps import (
            attention_token_spans,
            collect_cross_attention,
        )
        from avsl_tpu.decode.ctc import word_alignments

        tokens = np.concatenate(
            [self._prompt, np.asarray(seqs, np.int32)], axis=1
        )
        inter = self._run_align(audio, video, tokens)
        per_item = collect_cross_attention(inter)
        out: List[List[dict]] = []
        eot = int(self.tokenizer.eot)
        for b in range(tokens.shape[0]):
            nf = max(int(np.ceil(n_samples[b] / 320.0)), 1)
            toks = [int(t) for t in tokens[b]]
            # crop at the first EOT (inclusive): the padded EOT rows
            # after it would otherwise absorb the trailing frames (the
            # DTW path must end on the last row) and squeeze the last
            # word's end time
            q_end = (toks.index(eot) + 1) if eot in toks else len(toks)
            spans = attention_token_spans(per_item[b][:, :q_end, :], nf)
            out.append(word_alignments(
                toks[:q_end], spans, self.tokenizer,
                frame_rate_hz=50.0,
                special_ids=self.tokenizer.special_token_set,
            ))
        return out

    # -- public API ----------------------------------------------------

    def transcribe_batch(self, items: Sequence[Dict[str, Any]]) -> List[TranscribeResult]:
        """Synchronously transcribe ONE batch (<= batch_size items): host
        prepare -> compiled program -> detokenize. The building block the
        dynamic-batching server (infer/server.py) schedules; `transcribe`
        adds producer-thread prefetch over many batches."""
        if not items:
            return []
        if len(items) > self.batch_size:
            raise ValueError(
                f"{len(items)} items > batch_size {self.batch_size}"
            )
        chunk = list(items)
        audio, video, raw, raw_mask, raw_frames, flags, n, n_samples = self._prepare_batch(chunk)
        if raw is not None:
            import jax.numpy as jnp

            lip = self._lip_from_raw(jnp.asarray(raw), jnp.asarray(raw_frames))
            m = jnp.asarray(raw_mask)[:, None, None, None, None]
            video = jnp.where(m, lip, jnp.asarray(video))
        seqs, scores = self._dispatch(audio, video)
        seqs, scores = np.asarray(seqs), np.asarray(scores)
        words = (self._word_timestamps(audio, video, seqs, n_samples)
                 if self.word_timestamps else None)
        special = self.tokenizer.special_token_set
        results: List[TranscribeResult] = []
        for i in range(n):
            toks = [int(x) for x in seqs[i]]
            text_ids = [x for x in toks if x not in special]
            results.append(
                TranscribeResult(
                    id=str(chunk[i].get("id", i)),
                    text=self.tokenizer.decode(text_ids).strip(),
                    tokens=toks,
                    has_video=flags[i],
                    avg_logprob=round(float(scores[i]), 4),
                    words=None if words is None else words[i],
                )
            )
        return results

    def transcribe_long(self, items: Sequence[Dict[str, Any]]):
        """Long-form: items of ARBITRARY duration (audio path/array +
        optional 'lip_video'). Each item is split at minimum-energy cut
        points into <= audio_max_length windows (infer/longform.py); the
        windows of ALL items are flattened into the ordinary batched
        `transcribe` call (full tile occupancy), then stitched back into
        per-item `LongFormResult`s with per-window timestamps."""
        from avsl_tpu.infer.longform import split_item, stitch

        window_items: List[Dict[str, Any]] = []
        bounds: List[int] = [0]
        spans: List[List] = []
        for item in items:
            w, sp = split_item(
                item, self.audio_max_length, self.video_frames, crop=self.crop
            )
            window_items.extend(w)
            bounds.append(len(window_items))
            spans.append(sp)
        flat = self.transcribe(window_items)
        return [
            stitch(str(item.get("id", j)), flat[bounds[j]: bounds[j + 1]], spans[j])
            for j, item in enumerate(items)
        ]

    def transcribe(self, items: Sequence[Dict[str, Any]]) -> List[TranscribeResult]:
        """Items: dicts with 'id', 'audio' (path or array), optional
        'lip_video'/'video' path. Returns per-item results in order."""
        batches = [
            items[i : i + self.batch_size]
            for i in range(0, len(items), self.batch_size)
        ]
        queue: Queue = Queue(maxsize=self.prefetch)

        def producer():
            # any load failure must reach the consumer — a swallowed
            # exception here would never enqueue the sentinel and the
            # consumer would block on queue.get() forever
            try:
                for chunk in batches:
                    queue.put((chunk, self._prepare_batch(chunk)))
                queue.put(None)
            except Exception as e:  # surfaced + re-raised by the consumer
                queue.put(("__producer_error__", e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        special = self.tokenizer.special_token_set
        results: List[TranscribeResult] = []
        while True:
            got = queue.get()
            if got is None:
                break
            if isinstance(got, tuple) and got[0] == "__producer_error__":
                t.join()
                raise got[1]
            chunk, (audio, video, raw, raw_mask, raw_frames, flags, n, n_samples) = got
            if raw is not None:
                import jax.numpy as jnp

                lip = self._lip_from_raw(
                    jnp.asarray(raw), jnp.asarray(raw_frames)
                )
                m = jnp.asarray(raw_mask)[:, None, None, None, None]
                video = jnp.where(m, lip, jnp.asarray(video))
            seqs, scores = self._dispatch(audio, video)
            seqs, scores = np.asarray(seqs), np.asarray(scores)
            words = (self._word_timestamps(audio, video, seqs, n_samples)
                     if self.word_timestamps else None)
            for i in range(n):
                toks = [int(x) for x in seqs[i]]
                text_ids = [x for x in toks if x not in special]
                results.append(
                    TranscribeResult(
                        id=str(chunk[i].get("id", len(results))),
                        text=self.tokenizer.decode(text_ids).strip(),
                        tokens=toks,
                        has_video=flags[i],
                        avg_logprob=round(float(scores[i]), 4),
                        words=None if words is None else words[i],
                    )
                )
        t.join()
        return results
