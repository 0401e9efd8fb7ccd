"""Environment-preflight CLI (reference parity:
avsl/test/test_whisper_flamingo.py::test_system_requirements run first by
scripts/test/run_all_tests.sh)."""

import yaml

from avsl_tpu.cli import doctor


def test_doctor_passes_in_this_env(capsys):
    rc = doctor.main([])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "jax backend" in out and "audio kernels" in out
    assert "FAIL" not in out


def test_doctor_validates_config(tmp_path, capsys):
    cfg = {"model_name": "test", "check_output_dir": str(tmp_path / "ck"),
           "log_output_dir": str(tmp_path / "lg")}
    path = tmp_path / "c.yaml"
    path.write_text(yaml.safe_dump(cfg))
    doctor._RESULTS.clear()
    rc = doctor.main(["--config", str(path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "c.yaml" in out


def test_doctor_fails_on_unreadable_config(tmp_path, capsys):
    doctor._RESULTS.clear()
    rc = doctor.main(["--config", str(tmp_path / "missing.yaml")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out
