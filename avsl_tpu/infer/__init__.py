from avsl_tpu.infer.pipeline import StreamingTranscriber, TranscribeResult  # noqa: F401
from avsl_tpu.infer.server import TranscriptionServer  # noqa: F401
from avsl_tpu.infer.longform import LongFormResult, LongSegment  # noqa: F401
from avsl_tpu.infer.streaming import StreamingSession  # noqa: F401
from avsl_tpu.infer.export import export_serving_program, load_exported  # noqa: F401
