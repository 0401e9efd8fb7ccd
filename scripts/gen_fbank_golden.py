"""Generate the committed logfbank golden vectors (tests/goldens/).

Run on any machine. Uses the REAL python_speech_features library when it
is importable — the delivery environment has neither the package nor
network egress (documented limitation; VERDICT round-2 item 6), so the
checked-in artifact records which source produced it in its ``source``
field. Regenerating on a machine with psf installed and re-running the
test suite verifies the committed vectors against the actual library:

    python scripts/gen_fbank_golden.py && python -m pytest tests/test_audio_kernels.py -q

The deterministic probe signal matches tests/test_audio_kernels.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_signal() -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(1.7 * 16000)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


def main() -> None:
    audio = probe_signal()
    try:
        from python_speech_features import logfbank as psf_logfbank

        feat = psf_logfbank(audio, samplerate=16000, nfilt=26)
        source = "python_speech_features"
    except ImportError:
        from tests.test_audio_kernels import _np_psf_logfbank

        feat = _np_psf_logfbank(audio)
        source = "numpy-port"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "logfbank_golden.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, logfbank=feat.astype(np.float64),
                        source=np.array(source))
    print(f"wrote {out} (source={source}, shape={feat.shape})")


if __name__ == "__main__":
    main()
