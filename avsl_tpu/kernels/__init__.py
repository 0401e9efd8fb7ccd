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
)
from avsl_tpu.kernels.resample import resample_poly  # noqa: F401
from avsl_tpu.kernels.specaugment import spec_augment  # noqa: F401
from avsl_tpu.kernels.track import ncc_track_clip, ncc_track_batch  # noqa: F401
from avsl_tpu.kernels.warp import (  # noqa: F401
    umeyama,
    warp_and_crop_clip,
    warp_and_crop_clip_separable,
)
