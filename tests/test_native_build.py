"""Build-on-first-use of the native modules (utils/native_build.py).

Round 4's driver bench ran on a fresh checkout with no .so built, so the
host lip-crop path silently used the numpy fallback at ~11x the native
cost. These tests pin: (a) ensure_built compiles a missing target, (b)
staleness triggers a rebuild, (c) AVSL_NO_NATIVE_BUILD=1 disables it,
(d) the real warp library loads (auto-building if needed).
"""

import os
import time

from avsl_tpu.utils.native_build import ensure_built

MAKEFILE = """\
libtest_native.so: test_src.c
\tcc -shared -fPIC -o $@ $<
"""
SRC = "int avsl_test_fn(void) { return 42; }\n"


def _write_project(tmp_path):
    (tmp_path / "Makefile").write_text(MAKEFILE)
    (tmp_path / "test_src.c").write_text(SRC)
    return tmp_path / "libtest_native.so"


def test_builds_missing_target(tmp_path):
    so = _write_project(tmp_path)
    assert not so.exists()
    ensure_built(str(tmp_path), "libtest_native.so")
    assert so.exists()


def test_rebuilds_stale_target(tmp_path):
    so = _write_project(tmp_path)
    ensure_built(str(tmp_path), "libtest_native.so")
    first = so.stat().st_mtime
    # make the source newer than the .so
    future = time.time() + 10
    os.utime(str(tmp_path / "test_src.c"), (future, future))
    ensure_built(str(tmp_path), "libtest_native.so")
    assert so.stat().st_mtime > first


def test_env_var_disables_build(tmp_path, monkeypatch):
    so = _write_project(tmp_path)
    monkeypatch.setenv("AVSL_NO_NATIVE_BUILD", "1")
    ensure_built(str(tmp_path), "libtest_native.so")
    assert not so.exists()


def test_failed_build_is_nonfatal(tmp_path, capsys):
    (tmp_path / "Makefile").write_text("libtest_native.so: missing_src.c\n")
    (tmp_path / "test_src.c").write_text(SRC)
    ensure_built(str(tmp_path), "libtest_native.so")  # must not raise
    assert not (tmp_path / "libtest_native.so").exists()


def test_warp_native_loads():
    from avsl_tpu.kernels import warp_native

    assert warp_native.native_available(), (
        "libavsl_warp.so failed to auto-build; the bench headline would "
        "silently run the ~11x slower numpy sampler"
    )
