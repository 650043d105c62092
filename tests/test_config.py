"""Config loader parity tests (reference: tests/test_config.py)."""

from __future__ import annotations

import pytest

from etl_file_sync_spark.pipeline.config import (
    ConfigError,
    discover_servers,
    get_dlq_topic,
    get_server_config,
)

ENV = {
    "ALPHA_TYPE": "ftp",
    "ALPHA_HOST": "10.0.0.1",
    "ALPHA_PORT": "2121",
    "ALPHA_USER": "u",
    "ALPHA_PASS": "p",
    "BETA_TYPE": "local",
    "BETA_BASE_PATH": "/srv/data",
}


def test_lookup_and_defaults():
    a = get_server_config("alpha", ENV)  # case-insensitive
    assert a.type == "ftp" and a.host == "10.0.0.1" and a.port == 2121
    b = get_server_config("BETA", ENV)
    assert b.type == "local" and b.base_path == "/srv/data" and b.port == 21  # default port


def test_unknown_and_bad_port():
    with pytest.raises(ConfigError):
        get_server_config("GAMMA", ENV)
    with pytest.raises(ConfigError):
        get_server_config("ALPHA", {**ENV, "ALPHA_PORT": "not-a-port"})


def test_discover():
    names = {s.hostname for s in discover_servers(ENV)}
    assert names == {"ALPHA", "BETA"}


def test_dlq_topic_naming():
    assert get_dlq_topic("jobs", "-dlq") == "jobs-dlq"
    assert get_dlq_topic("", "-dlq") == "-dlq"  # boundary parity (test_config.py:44-62)
    assert get_dlq_topic("a.b-c", ".dead") == "a.b-c.dead"
