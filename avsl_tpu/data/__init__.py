from avsl_tpu.data.ami_xml import (  # noqa: F401
    AMI_SPEAKERS,
    parse_words_file,
    process_transcripts,
    process_transcript_files,
    disfluency_laughter_to_csv,
    dialogue_acts_to_csv,
    load_disfluency_types,
    load_ap_types,
    load_da_types,
)
from avsl_tpu.data.segments import (  # noqa: F401
    Segment,
    collect_segments_from_transcripts,
    segment_id,
    parse_transcript_line,
)
from avsl_tpu.data.batching import LengthBucketBatcher, bucket_boundaries  # noqa: F401
