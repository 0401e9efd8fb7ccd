"""Native media runtime (cpp/avsl_media) tests. Builds the .so on demand."""

import os
import subprocess

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"


@pytest.fixture(scope="module")
def native():
    so = os.path.join(REPO, "cpp", "avsl_media", "libavsl_media.so")
    if not os.path.exists(so):
        r = subprocess.run(
            ["make", "-C", os.path.join(REPO, "cpp", "avsl_media")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"cannot build native module: {r.stderr[-500:]}")
    from avsl_tpu.data import media_native as mn

    mn._load_lib.cache_clear()
    if not mn.native_available():
        pytest.skip("native module unavailable")
    return mn


def test_audio_decode_resample(native, tmp_path):
    sr0 = 44100
    t = np.arange(sr0 * 2) / sr0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    wavfile.write(p, sr0, (x * 32767).astype(np.int16))

    audio, sr = native.decode_audio(p, target_sr=16000)
    assert sr == 16000
    assert abs(len(audio) - 32000) < 100
    peak = np.abs(np.fft.rfft(audio[:16000])).argmax()
    assert abs(peak - 440) <= 2  # bins are 1 Hz at 1 s window

    batch, counts = native.decode_audio_batch([p] * 4, max_samples=32000)
    assert batch.shape == (4, 32000)
    assert (counts == 32000).all()


def test_audio_decode_error(native):
    with pytest.raises(IOError):
        native.decode_audio("/nonexistent/file.wav")


@pytest.mark.skipif(not os.path.exists(AMI_EXAMPLE), reason="AMI example not mounted")
def test_video_decode_matches_cv2(native):
    from avsl_tpu.data.video_io import read_video_frames

    frames = native.decode_video_gray(AMI_EXAMPLE)
    cvf = read_video_frames(AMI_EXAMPLE, grayscale=True)
    assert frames.shape == cvf.shape
    # different YUV->gray paths; should agree within ~2 gray levels
    diff = np.abs(frames.astype(float) - cvf.astype(float)).mean()
    assert diff < 3.0, diff


@pytest.mark.skipif(not os.path.exists(AMI_EXAMPLE), reason="AMI example not mounted")
def test_video_batch_decode(native):
    arena, counts = native.decode_video_batch(
        [AMI_EXAMPLE] * 4, out_size=(176, 144), max_frames=60
    )
    assert arena.shape == (4, 60, 144, 176)
    assert (counts == 60).all()
    # all workers decoded the same content
    np.testing.assert_array_equal(arena[0], arena[3])


@pytest.mark.skipif(not os.path.exists(AMI_EXAMPLE), reason="AMI example not mounted")
def test_video_decode_resized_and_capped(native):
    frames = native.decode_video_gray(AMI_EXAMPLE, max_frames=10, out_size=(96, 96))
    assert frames.shape == (10, 96, 96)
