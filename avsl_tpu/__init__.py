"""AVSL-TPU: a TPU-native audio-visual speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the AVSL
research pipeline (audio-visual speech recognition on the AMI Meeting
Corpus): AMI annotation parsing, media preprocessing (log-mel / logfbank
audio features, 96x96 lip-ROI extraction), AV-HuBERT-style fusion
encoders, Whisper encoder/decoder, Whisper-Flamingo gated cross-attention
fine-tuning, KV-cached batched beam search, and SPMD training over a
`jax.sharding.Mesh`.

Design notes
------------
* Compute path is JAX/XLA with Pallas TPU kernels for the hot ops.
* Everything under `jit` uses static shapes; variable-length batches are
  handled by token-budget length bucketing into a small set of padded
  shapes (see `avsl_tpu.data.batching`).
* Parallelism is expressed with `jax.sharding` (NamedSharding over a
  Mesh with `data` / `model` axes), not process-level DDP.
"""

__version__ = "0.1.0"

from avsl_tpu.core import config as config  # noqa: F401
