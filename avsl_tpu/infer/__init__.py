from avsl_tpu.infer.pipeline import StreamingTranscriber, TranscribeResult  # noqa: F401
