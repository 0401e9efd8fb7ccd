from avsl_tpu.decode.text_norm import (  # noqa: F401
    normalize_text,
    wer_cer,
    edit_distance,
)
from avsl_tpu.decode.greedy import (  # noqa: F401
    mask_after_eot,
    teacher_forced_predictions,
    greedy_decode,
)
from avsl_tpu.decode.beam import beam_search  # noqa: F401
