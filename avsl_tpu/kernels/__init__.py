from avsl_tpu.kernels.mel import (  # noqa: F401
    mel_filterbank_slaney,
    mel_filterbank_htk_psf,
    hz_to_mel_slaney,
    mel_to_hz_slaney,
)
from avsl_tpu.kernels.logmel import (  # noqa: F401
    pad_or_trim,
    log_mel_spectrogram,
    N_FFT,
    HOP_LENGTH,
    SAMPLE_RATE,
)
from avsl_tpu.kernels.fbank import (  # noqa: F401
    logfbank,
    stack_frames,
    frame_normalize,
    avhubert_audio_features,
    mfcc,
)
from avsl_tpu.kernels.resample import resample_poly  # noqa: F401
from avsl_tpu.kernels.specaugment import spec_augment  # noqa: F401
from avsl_tpu.kernels.track import (  # noqa: F401
    ncc_track_clip,
    ncc_track_batch,
    ncc_track_clip_anchored,
    ncc_track_batch_anchored,
)
from avsl_tpu.kernels.warp import (  # noqa: F401
    umeyama,
    warp_and_crop_clip,
    warp_and_crop_clip_separable,
    separable_crop_coords,
    separable_crop_coords_np,
    sample_separable,
)
from avsl_tpu.kernels.lip_pipeline import (  # noqa: F401
    make_lip_frontend,
    make_staged_lip_frontend,
)
