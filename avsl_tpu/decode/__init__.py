from avsl_tpu.decode.text_norm import (  # noqa: F401
    normalize_text,
    wer_cer,
    edit_distance,
    compression_ratio,
)
from avsl_tpu.decode.greedy import (  # noqa: F401
    mask_after_eot,
    teacher_forced_predictions,
    greedy_decode,
    greedy_decode_scored,
    sampled_decode_scored,
)
from avsl_tpu.decode.beam import beam_search  # noqa: F401
from avsl_tpu.decode.biasing import (  # noqa: F401
    BiasingTrie,
    bias_adjust,
    bias_advance,
    build_biasing_trie,
    encode_phrases,
)
from avsl_tpu.decode.speculative import (  # noqa: F401
    SpecDecodeResult,
    broadcast_cache_index,
    speculative_greedy_decode,
)
from avsl_tpu.decode.ctc import (  # noqa: F401
    ctc_best_path,
    ctc_best_path_scores,
    ctc_decode_to_text,
    ctc_forced_align,
    ctc_prefix_beam_search,
    ctc_prefix_beam_search_batch,
    word_alignments,
)
from avsl_tpu.decode.word_timestamps import (  # noqa: F401
    attention_token_spans,
    dtw_path,
    whisper_word_timestamps,
)
from avsl_tpu.decode.language import (  # noqa: F401
    detect_language,
    detect_language_logits,
)
