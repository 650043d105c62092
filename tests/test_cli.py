"""CLI entry parity tests (reference: tests/test_main.py) — positional vs
flag precedence, env-file loading."""

from __future__ import annotations

import os

from etl_file_sync_spark.pipeline.run import load_env_file, parse_args


def test_positional_args():
    a = parse_args(["jobs", "grp1", "broker:9092"])
    assert (a.topic, a.group_id, a.bootstrap_servers) == ("jobs", "grp1", "broker:9092")


def test_flag_overrides_positional():
    # flag wins over positional (main.py:100-102 parity)
    a = parse_args(["jobs", "grp1", "b1:9092", "--topic", "other", "--bootstrap-servers", "b2:9092"])
    assert a.topic == "other" and a.bootstrap_servers == "b2:9092" and a.group_id == "grp1"


def test_manifest_mode_flags(tmp_path):
    a = parse_args(["--manifest", "m.jsonl", "--output-dir", str(tmp_path)])
    assert a.manifest == "m.jsonl" and a.topic is None


def test_env_file_loading(tmp_path):
    env = tmp_path / ".env"
    env.write_text("# comment\nTESTSRV_TYPE=local\nTESTSRV_BASE_PATH=/data\n\nbroken-line\n")
    for k in ("TESTSRV_TYPE", "TESTSRV_BASE_PATH"):
        os.environ.pop(k, None)
    try:
        load_env_file(str(env))
        assert os.environ["TESTSRV_TYPE"] == "local"
        assert os.environ["TESTSRV_BASE_PATH"] == "/data"
    finally:
        for k in ("TESTSRV_TYPE", "TESTSRV_BASE_PATH"):
            os.environ.pop(k, None)


def test_env_file_does_not_override_existing(tmp_path):
    env = tmp_path / ".env"
    env.write_text("PRESETVAR_X=from_file\n")
    os.environ["PRESETVAR_X"] = "preset"
    try:
        load_env_file(str(env))
        assert os.environ["PRESETVAR_X"] == "preset"
    finally:
        os.environ.pop("PRESETVAR_X", None)
