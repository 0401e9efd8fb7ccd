"""Build-on-first-use for the in-tree native modules (cpp/*).

The shared libraries are build artifacts (gitignored), so a fresh
checkout has none — and round 4's driver bench silently ran the numpy
fallback sampler at ~11x the native cost (host_crop_median_s 4.24 s vs
0.30 s measured with the .so present). Loaders call :func:`ensure_built`
before probing for the library: if the .so is absent or older than its
sources, run ``make -C <dir>`` once, quietly, with a bounded timeout.
Failure is non-fatal (the numpy/cv2 fallbacks stay correct, just slow);
set ``AVSL_NO_NATIVE_BUILD=1`` to skip the attempt entirely.
"""

from __future__ import annotations

import os
import subprocess
import sys


def ensure_built(src_dir: str, target: str, timeout_s: float = 180.0) -> None:
    """Run ``make`` in ``src_dir`` if ``target`` is missing or stale.

    ``src_dir``: directory containing a Makefile whose default goal
    produces ``target`` (a filename relative to ``src_dir``).
    """
    if os.environ.get("AVSL_NO_NATIVE_BUILD") == "1":
        return
    src_dir = os.path.abspath(src_dir)
    out = os.path.join(src_dir, target)
    try:
        sources = [
            os.path.join(src_dir, f)
            for f in os.listdir(src_dir)
            if f.endswith((".cpp", ".cc", ".c", ".h", ".hpp")) or f == "Makefile"
        ]
    except OSError:
        return
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in sources
    ):
        return
    try:
        r = subprocess.run(
            ["make", "-C", src_dir],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if r.returncode != 0:
            print(
                f"avsl_tpu: native build in {src_dir} failed "
                f"(rc={r.returncode}); using slow fallback.\n{r.stderr[-2000:]}",
                file=sys.stderr,
            )
    except (OSError, subprocess.TimeoutExpired) as e:  # pragma: no cover
        print(
            f"avsl_tpu: native build in {src_dir} skipped ({e}); "
            "using slow fallback.",
            file=sys.stderr,
        )
