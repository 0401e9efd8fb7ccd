"""Environment preflight: ``python -m avsl_tpu.cli.doctor``.

The reference ships a system-requirements test that checks CUDA,
directories and model files before training
(/root/reference/avsl/test/test_whisper_flamingo.py:656-713, run first by
scripts/test/run_all_tests.sh); this is its TPU-native equivalent as a
first-class CLI. Checks are side-effect-free and each prints PASS/WARN/
FAIL with a one-line consequence; exit code is 1 only on FAIL.

Checked: python deps, jax backend + device kind, a tiny compile
(diagnoses broken runtimes before a 30-min job does), the native media
library (with build hint), ffmpeg/cv2 video IO fallback chain, detector
assets, YAML config loadability, and write access to the output dirs of
a config when one is given.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Callable, List, Optional, Tuple

_RESULTS: List[Tuple[str, str, str]] = []  # (status, name, detail)


def _record(status: str, name: str, detail: str = "") -> None:
    _RESULTS.append((status, name, detail))
    pad = {"PASS": "PASS ", "WARN": "WARN ", "FAIL": "FAIL "}[status]
    line = f"[{pad.strip()}] {name}"
    if detail:
        line += f" — {detail}"
    print(line)


def check(name: str, warn_only: bool = False):
    """Decorator: run the check, catch everything, record the outcome.
    The check returns a detail string (PASS) or raises."""

    def wrap(fn: Callable[[], Optional[str]]):
        def run():
            try:
                detail = fn() or ""
                _record("PASS", name, detail)
            except Exception as e:  # noqa: BLE001 — preflight must not crash
                _record("WARN" if warn_only else "FAIL", name, str(e))

        return run

    return wrap


def main(argv: Optional[List[str]] = None) -> int:
    _RESULTS.clear()  # module-level accumulator: reset per invocation
    p = argparse.ArgumentParser(prog="avsl_tpu.cli.doctor")
    p.add_argument("--config", default=None,
                   help="training YAML to validate (keys + output dirs)")
    args = p.parse_args(argv)

    @check("python dependencies")
    def deps():
        import flax  # noqa: F401
        import jax
        import optax  # noqa: F401
        import orbax.checkpoint  # noqa: F401
        import yaml  # noqa: F401

        return f"jax {jax.__version__}"

    @check("jax backend")
    def backend():
        import jax

        devs = jax.devices()
        kinds = {d.platform for d in devs}
        return f"{len(devs)} device(s): {sorted(kinds)}"

    @check("tiny compile + execute")
    def compile_probe():
        import jax
        import jax.numpy as jnp

        out = jax.jit(lambda x: (x @ x.T).sum())(jnp.eye(8))
        assert float(out) == 8.0
        return "jit matmul ok"

    @check("native media decoder", warn_only=True)
    def native():
        from avsl_tpu.data.media_native import native_available

        if not native_available():
            raise RuntimeError(
                "libavsl_media.so not built — video decode falls back to "
                "cv2 (slower, no thread-pool batching); build with "
                "`make -C cpp/avsl_media`"
            )
        return "libavsl_media.so loaded"

    @check("video IO fallback chain", warn_only=True)
    def video_io():
        import numpy as np

        from avsl_tpu.data.video_io import (
            read_video_frames,
            validate_video,
            write_video_frames,
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = write_video_frames(
                os.path.join(d, "probe.mp4"),
                np.zeros((4, 32, 32), np.uint8), fps=25,
            )
            ok, reason = validate_video(path)
            assert ok, reason
            frames = read_video_frames(path, grayscale=True)
            assert frames.shape == (4, 32, 32)
        return "write/validate/read ok"

    @check("landmark detector assets", warn_only=True)
    def detector_assets():
        from avsl_tpu.data.landmarks import DEFAULT_CNN_WEIGHTS

        if not os.path.exists(DEFAULT_CNN_WEIGHTS):
            raise RuntimeError(
                "landmark_cnn.npz missing — CNNLandmarkDetector will run "
                "random-initialized; train with "
                "`python -m avsl_tpu.cli.train_landmarks`"
            )
        return os.path.basename(DEFAULT_CNN_WEIGHTS)

    @check("audio kernels")
    def audio():
        import numpy as np

        from avsl_tpu.kernels import log_mel_spectrogram, logfbank

        x = np.zeros(16000, np.float32)
        mel = np.asarray(log_mel_spectrogram(x))
        fb = np.asarray(logfbank(x))
        assert mel.shape[0] == 80 and fb.shape[1] == 26
        return f"mel {mel.shape}, logfbank {fb.shape}"

    deps()
    backend()
    compile_probe()
    native()
    video_io()
    detector_assets()
    audio()

    if args.config:

        @check(f"config {os.path.basename(args.config)}")
        def config_check():
            from avsl_tpu.core.config import load_yaml_config

            cfg = load_yaml_config(args.config)
            details = []
            for key in ("check_output_dir", "log_output_dir"):
                path = cfg.get(key)
                if path:
                    parent = os.path.dirname(os.path.abspath(str(path))) or "."
                    if not os.access(
                        parent if os.path.isdir(parent) else ".", os.W_OK
                    ):
                        raise RuntimeError(f"{key}={path} not writable")
                    details.append(key)
            return "loads; writable: " + (", ".join(details) or "n/a")

        config_check()

    fails = [r for r in _RESULTS if r[0] == "FAIL"]
    warns = [r for r in _RESULTS if r[0] == "WARN"]
    print(f"\n{len(_RESULTS)} checks: {len(_RESULTS) - len(fails) - len(warns)}"
          f" pass, {len(warns)} warn, {len(fails)} fail")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
