"""Runtime dataset + collator (L4): HF dataset rows -> model-ready batches.

Parity with the reference's ``AmiVideoHFDataset.__getitem__``
(avsl/whisper_flamingo_ft_ami.py:187-313 in /root/reference) and the
external ``WhisperVideoCollatorWithPadding`` contract (SURVEY.md §2.7):

per item: resample -> 16 kHz float, ``pad_or_trim`` to the configured max,
log-mel (80, or 128 for large-v3), jiwer-style text normalization,
Whisper SOT sequence + tokens with shifted labels + EOT, lip-video load
(88 crop, mean .421 / std .165), video trimmed to
``round(audio_len/16000*25)`` frames.

TPU-first differences: SpecAugment runs on device inside the train step
(kernels/specaugment.py) instead of per item on the host, and batches are
padded to the length-bucket boundary so XLA sees a small closed set of
shapes (data/batching.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from avsl_tpu.data.batching import LengthBucketBatcher
from avsl_tpu.data.tokenizer import Tokenizer
from avsl_tpu.decode.text_norm import normalize_text


def _extract_audio(item: Dict[str, Any], target_sr: int = 16000) -> np.ndarray:
    """HF 'audio' value (dict / path) -> mono float32 at 16 kHz."""
    from avsl_tpu.data.audio_segments import pcm_to_float

    audio = item.get("audio")
    if isinstance(audio, dict) and audio.get("array") is not None:
        # normalize BEFORE any float cast: an int16/int32 array cell
        # must be rescaled, not reinterpreted
        data = pcm_to_float(audio["array"])
        sr = int(audio.get("sampling_rate", target_sr))
    elif isinstance(audio, dict) and audio.get("bytes") and not (
        audio.get("path") and os.path.exists(audio["path"])
    ):
        # decode=False HF Audio cells carry embedded wav bytes after
        # save_to_disk (the stored path is just the original basename)
        import io

        import scipy.io.wavfile as wavfile

        sr, data = wavfile.read(io.BytesIO(audio["bytes"]))
        data = pcm_to_float(data)
    else:
        path = audio.get("path") if isinstance(audio, dict) else audio
        from avsl_tpu.data.audio_segments import load_wav

        return load_wav(path, target_sr)
    if sr != target_sr:
        from avsl_tpu.kernels.resample import resample_poly

        data = np.asarray(resample_poly(data, sr, target_sr))
    return data.astype(np.float32)


def _extract_video_path(item: Dict[str, Any], key: str = "lip_video") -> Optional[str]:
    v = item.get(key)
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        return v.get("path")
    for attr in ("_hf_encoded", "path", "filename"):
        got = getattr(v, attr, None)
        if isinstance(got, dict) and "path" in got:
            return got["path"]
        if isinstance(got, str):
            return got
    return None


class AmiVideoDataset:
    """Per-item AV example builder over an HF dataset / record list."""

    def __init__(
        self,
        hf_dataset,
        tokenizer: Tokenizer,
        audio_max_length: int = 160000,
        n_mels: int = 80,
        lang: str = "en",
        sample_rate: int = 16000,
        image_crop_size: int = 88,
        image_mean: float = 0.421,
        image_std: float = 0.165,
        fps: int = 25,
        load_video: bool = True,
        train: bool = False,
    ):
        self.ds = hf_dataset
        self.tokenizer = tokenizer
        self.audio_max_length = audio_max_length
        self.n_mels = n_mels
        self.lang = lang
        self.sample_rate = sample_rate
        self.image_crop_size = image_crop_size
        self.image_mean = image_mean
        self.image_std = image_std
        self.fps = fps
        self.load_video = load_video
        self.train = train

    def __len__(self) -> int:
        return len(self.ds)

    def audio_length(self, idx: int) -> int:
        """Cheap per-item length estimate in samples (for bucketing).
        Reads the duration COLUMN once and caches it — per-row access on
        an HF dataset materializes the full row (embedded audio/video
        bytes) and a naive loop re-reads the whole corpus every epoch."""
        if not hasattr(self, "_durations"):
            try:
                col = self.ds["duration"] if hasattr(self.ds, "__getitem__") else None
                self._durations = None if col is None else [
                    (None if d is None else float(d)) for d in col
                ]
            except Exception:
                self._durations = None
        if self._durations is not None:
            d = self._durations[idx]
            if d is not None:
                return int(d * self.sample_rate)
            return self.audio_max_length
        dur = self.ds[idx].get("duration")
        if dur is not None:
            return int(float(dur) * self.sample_rate)
        return self.audio_max_length

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        from avsl_tpu.kernels.logmel import log_mel_spectrogram, pad_or_trim

        item = self.ds[idx]
        audio = _extract_audio(item, self.sample_rate)
        audio_frames = len(audio) // (self.sample_rate // 100)
        audio = np.asarray(pad_or_trim(audio, self.audio_max_length))
        mel = np.asarray(log_mel_spectrogram(audio, n_mels=self.n_mels))

        text = normalize_text(str(item.get("transcript", "")))
        toks = self.tokenizer.prepare_example(text, self.lang)

        out: Dict[str, Any] = {
            "input_ids": mel.astype(np.float32),  # [n_mels, T]
            "dec_input_ids": np.asarray(toks["dec_input_ids"], np.int64),
            "labels": np.asarray(toks["labels"], np.int64),
            "audio_frames": audio_frames,
        }
        if self.load_video:
            path = _extract_video_path(item)
            if path and os.path.exists(path):
                from avsl_tpu.data.video_io import load_video_feats, trim_video_to_audio

                feats = load_video_feats(
                    path,
                    train=self.train,
                    image_crop_size=self.image_crop_size,
                    image_mean=self.image_mean,
                    image_std=self.image_std,
                )
                feats = trim_video_to_audio(
                    feats, len(audio), self.sample_rate, self.fps
                )
                out["video"] = feats.astype(np.float32)
            else:
                out["video"] = np.zeros(
                    (1, self.image_crop_size, self.image_crop_size, 1), np.float32
                )
        return out


class WhisperVideoCollator:
    """Pad a list of items to one static-shape batch.

    labels are padded with -100 (CE ignore), dec_input_ids with EOT,
    video on the time axis with zeros; emits ``video_mask`` (True = valid
    frame) and ``label_mask``. ``video_pad_len`` / ``label_pad_len`` may
    pin the padded shapes (bucketed execution)."""

    def __init__(self, eot_id: int, video_pad_len: Optional[int] = None,
                 label_pad_len: Optional[int] = None,
                 max_label_len: Optional[int] = None):
        self.eot_id = eot_id
        self.video_pad_len = video_pad_len
        self.label_pad_len = label_pad_len
        self.max_label_len = max_label_len  # text_max_length / n_text_ctx cap

    def __call__(self, items: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        batch: Dict[str, np.ndarray] = {}
        batch["input_ids"] = np.stack([it["input_ids"] for it in items])

        lab_len = self.label_pad_len or max(len(it["labels"]) for it in items)
        if self.max_label_len is not None:
            lab_len = min(lab_len, self.max_label_len)
        labels = np.full((len(items), lab_len), -100, np.int64)
        dec = np.full((len(items), lab_len), self.eot_id, np.int64)
        for i, it in enumerate(items):
            L = min(len(it["labels"]), lab_len)
            labels[i, :L] = it["labels"][:L]
            dec[i, :L] = it["dec_input_ids"][:L]
        batch["labels"] = labels
        batch["dec_input_ids"] = dec
        batch["audio_frames"] = np.asarray(
            [it["audio_frames"] for it in items], np.int32
        )

        if "video" in items[0]:
            v_len = self.video_pad_len or max(len(it["video"]) for it in items)
            h, w, c = items[0]["video"].shape[1:]
            video = np.zeros((len(items), v_len, h, w, c), np.float32)
            vmask = np.zeros((len(items), v_len), bool)
            for i, it in enumerate(items):
                L = min(len(it["video"]), v_len)
                video[i, :L] = it["video"][:L]
                vmask[i, :L] = True
            batch["video"] = video
            batch["video_mask"] = vmask
        return batch


class AVHubertDataset:
    """Per-item AV-HuBERT features with dataset-level modality dropout.

    Parity with the reference's AVHubertDataset (utils/data_loading.py:
    473-568): per-item probabilities of dropping the audio or video stream
    during training, with an at-least-one-modality fallback; audio is the
    104-dim stacked log-fbank path, video the normalized 88-crop lip clip.
    Dropped modalities are emitted as zeroed features + presence flag 0 so
    every batch shares one static-shape compiled program.
    """

    def __init__(
        self,
        rows,
        audio_drop_prob: float = 0.0,
        video_drop_prob: float = 0.0,
        train: bool = False,
        sample_rate: int = 16000,
        stack_order: int = 4,
        image_crop_size: int = 88,
        seed: int = 0,
        add_noise_prob: float = 0.0,
        noise_audio: Optional[np.ndarray] = None,
        noise_snr_db: float = 0.0,
    ):
        self.rows = rows
        self.audio_drop_prob = audio_drop_prob
        self.video_drop_prob = video_drop_prob
        self.train = train
        self.sample_rate = sample_rate
        self.stack_order = stack_order
        self.image_crop_size = image_crop_size
        self.seed = seed
        # SNR-controlled noise augmentation (reference
        # process_audio_for_av_hubert add_noise_prob path,
        # preprocess/audio_process.py:199-236)
        self.add_noise_prob = add_noise_prob
        self.noise_audio = noise_audio
        self.noise_snr_db = noise_snr_db
        # epoch folds into the per-item rng so modality-drop / noise
        # decisions RESAMPLE each epoch (a (seed, idx)-only rng would
        # drop the same items' audio for the whole run)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        from avsl_tpu.kernels.fbank import avhubert_audio_features

        item = self.rows[idx]
        rng = np.random.default_rng((self.seed, self.epoch, idx))
        drop_audio = self.train and rng.random() < self.audio_drop_prob
        drop_video = self.train and rng.random() < self.video_drop_prob
        if drop_audio and drop_video:  # at-least-one-modality fallback
            if rng.random() < 0.5:
                drop_audio = False
            else:
                drop_video = False

        audio = _extract_audio(item, self.sample_rate)
        if (
            self.train
            and self.noise_audio is not None
            and rng.random() < self.add_noise_prob
        ):
            from avsl_tpu.data.audio_segments import add_noise

            audio = add_noise(audio, self.noise_audio, self.noise_snr_db, rng)
        feats_a = np.asarray(
            avhubert_audio_features(audio, self.sample_rate, self.stack_order)
        )
        path = _extract_video_path(item)
        if path and os.path.exists(path):
            from avsl_tpu.data.video_io import load_video_feats

            feats_v = load_video_feats(path, image_crop_size=self.image_crop_size)
        else:
            feats_v = np.zeros(
                (len(feats_a), self.image_crop_size, self.image_crop_size, 1),
                np.float32,
            )
            drop_video = True
            if drop_audio:  # re-assert the at-least-one guarantee
                drop_audio = False
        t = min(len(feats_a), len(feats_v))  # truncate-to-min alignment
        out = {
            "audio_feats": np.zeros_like(feats_a[:t]) if drop_audio else feats_a[:t],
            "video_feats": np.zeros_like(feats_v[:t]) if drop_video else feats_v[:t],
            "audio_present": 0.0 if drop_audio else 1.0,
            "video_present": 0.0 if drop_video else 1.0,
        }
        if "transcript" in item:
            out["transcript"] = item["transcript"]
        return out


def make_bucketed_loader(
    dataset: AmiVideoDataset,
    collator: WhisperVideoCollator,
    batch_bins: int,
    num_shards: int = 1,
    shuffle: bool = True,
    epoch: int = 0,
    fps: int = 25,
):
    """Yield bucketed batches: item lengths (audio frames at 100 Hz) drive
    the token-budget batcher; each batch's video is padded to the bucket's
    frame count so XLA compiles one program per bucket."""
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)  # re-sample per-epoch augmentation draws
    lengths = [max(dataset.audio_length(i) // 160, 1) for i in range(len(dataset))]
    batcher = LengthBucketBatcher(lengths, batch_bins, num_shards=num_shards)
    for idx, padded_frames in batcher.batches(shuffle=shuffle, epoch=epoch):
        items = [dataset[int(i)] for i in idx]
        video_pad = max(int(np.ceil(padded_frames * fps / 100.0)), 1)
        collator.video_pad_len = video_pad
        yield collator(items)
