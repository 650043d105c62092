"""Health-probe parity with reference tests/test_health.py.

The reference's health tier hard-fails when infra is down (its CI owns a
live broker + FTP). This repo's probes are report-based: the unit tier
asserts probe behavior against the in-process FTP double, and an
env-gated live tier (ETL_KAFKA_BOOTSTRAP / *_TYPE env vars) exercises
real infrastructure when present — reference test_health.py:26-47.
"""

from __future__ import annotations

import os

import pytest

from etl_file_sync_spark.pipeline.health import (
    check_ftp_pool,
    check_local_path,
    check_tcp,
    healthy,
    kafka_bootstrap,
    probe_all,
)
from etl_file_sync_spark.pipeline.config import get_server_config
from tests.ftp_fixture import MiniFTPServer


@pytest.fixture()
def ftp_server(tmp_path):
    srv = MiniFTPServer(str(tmp_path)).start()
    yield srv
    srv.stop()


def _env_for(srv: MiniFTPServer) -> dict[str, str]:
    return {
        "SRC_FTP_SERVER1_TYPE": "FTP",
        "SRC_FTP_SERVER1_HOST": "127.0.0.1",
        "SRC_FTP_SERVER1_PORT": str(srv.port),
        "SRC_FTP_SERVER1_USER": "u",
        "SRC_FTP_SERVER1_PASS": "p",
    }


def test_tcp_probe_up_and_down(ftp_server):
    up = check_tcp("SRC_FTP_SERVER1", "127.0.0.1", ftp_server.port, timeout=2)
    assert up.healthy and up.kind == "tcp" and up.latency_ms >= 0
    # Port 1 on localhost: nothing listens there.
    down = check_tcp("dead", "127.0.0.1", 1, timeout=0.5)
    assert not down.healthy and down.detail


def test_ftp_pool_probe_logs_in_and_noops(ftp_server):
    cfg = get_server_config("SRC_FTP_SERVER1", _env_for(ftp_server))
    st = check_ftp_pool(cfg, timeout=2)
    assert st.healthy, st.detail
    assert st.kind == "ftp_pool" and st.detail == "pooled NOOP ok"


def test_ftp_pool_probe_reports_bad_credentials(ftp_server):
    env = _env_for(ftp_server) | {"SRC_FTP_SERVER1_PASS": "wrong", "SRC_FTP_SERVER1_USER": "nope"}
    cfg = get_server_config("SRC_FTP_SERVER1", env)
    st = check_ftp_pool(cfg, timeout=2)
    assert not st.healthy and st.detail


def test_local_path_probe(tmp_path):
    ok = check_local_path("LOCAL_DST", str(tmp_path))
    assert ok.healthy and ok.detail == "writable"
    missing = check_local_path("LOCAL_DST", str(tmp_path / "nope"))
    assert not missing.healthy


def test_probe_all_covers_servers_and_kafka(ftp_server, tmp_path):
    env = _env_for(ftp_server) | {
        "DST_LOCAL1_TYPE": "LOCAL",
        "DST_LOCAL1_BASE_PATH": str(tmp_path),
        # Point the kafka probe at the FTP socket: any listening TCP
        # port proves the probe's reachability path without a broker.
        "ETL_KAFKA_BOOTSTRAP": f"127.0.0.1:{ftp_server.port}",
    }
    statuses = probe_all(env=env, deep=True, timeout=2)
    by_key = {(s.target, s.kind): s for s in statuses}
    assert by_key[("SRC_FTP_SERVER1", "tcp")].healthy
    assert by_key[("SRC_FTP_SERVER1", "ftp_pool")].healthy
    assert by_key[("DST_LOCAL1", "local_path")].healthy
    assert by_key[("kafka", "tcp")].healthy
    assert healthy(statuses)


def test_probe_all_unconfigured_local_base_path_is_unhealthy(ftp_server):
    """A LOCAL server with no BASE_PATH must not fall back to probing
    "/" (writable as root → false healthy); it reports the misconfig."""
    env = _env_for(ftp_server) | {
        "DST_LOCAL1_TYPE": "LOCAL",
        "ETL_KAFKA_BOOTSTRAP": f"127.0.0.1:{ftp_server.port}",
    }
    statuses = probe_all(env=env, timeout=2)
    st = {(s.target, s.kind): s for s in statuses}[("DST_LOCAL1", "local_path")]
    assert not st.healthy and st.detail == "base_path not configured"
    assert not healthy(statuses)


def test_kafka_bootstrap_parsing():
    assert kafka_bootstrap({}) == ("localhost", 9092)
    assert kafka_bootstrap({"ETL_KAFKA_BOOTSTRAP": "broker1:19092,broker2:29092"}) == ("broker1", 19092)
    assert kafka_bootstrap({"KAFKA_BOOTSTRAP_SERVERS": "k"}) == ("k", 9092)


# -- live tier: runs only when real infrastructure is configured ----------

LIVE = os.environ.get("ETL_KAFKA_BOOTSTRAP")


@pytest.mark.skipif(not LIVE, reason="set ETL_KAFKA_BOOTSTRAP to run live-broker health checks")
def test_live_kafka_reachable():
    """Reference test_health.py:42-47: the broker must actually be up
    when the live tier is requested — fail, don't skip."""
    host, port = kafka_bootstrap()
    st = check_tcp("kafka", host, port, timeout=5)
    assert st.healthy, st.detail
