"""Operational health probes for pipeline infrastructure.

Parity with the reference's infra health checks
(/root/reference/tests/test_health.py:16-47): TCP reachability of every
configured FTP server and the Kafka broker, plus two probes the
reference doesn't have — live FTP login+NOOP through the shared
connection pool, and a local-path writability check for local servers.

Probes return structured rows instead of raising, so callers can ship
them to a sink, assert on them in tests, or expose them from a sidecar.
"""

from __future__ import annotations

import os
import socket
import time
from dataclasses import asdict, dataclass

from etl_file_sync_spark.pipeline.config import ServerConfig, discover_servers

DEFAULT_TIMEOUT = 5.0


@dataclass(frozen=True)
class HealthStatus:
    target: str  # logical name, e.g. "SRC_FTP_SERVER1" or "kafka"
    kind: str  # "tcp" | "ftp_pool" | "local_path"
    healthy: bool
    detail: str
    latency_ms: float

    def as_dict(self) -> dict:
        return asdict(self)


def check_tcp(target: str, host: str, port: int, timeout: float = DEFAULT_TIMEOUT) -> HealthStatus:
    """TCP connect probe — mirrors reference check_connection
    (test_health.py:16-22) but reports instead of failing the test."""
    t0 = time.perf_counter()
    try:
        with socket.create_connection((host, port), timeout=timeout):
            pass
        ok, detail = True, "connected"
    except OSError as e:
        ok, detail = False, f"{type(e).__name__}: {e}"
    return HealthStatus(target, "tcp", ok, detail, round((time.perf_counter() - t0) * 1e3, 2))


def check_ftp_pool(server: ServerConfig, timeout: float = DEFAULT_TIMEOUT) -> HealthStatus:
    """Borrow a pooled connection and NOOP-validate it — proves login
    credentials and pool plumbing, not just the socket."""
    from etl_file_sync_spark.pipeline.pool import FTPPoolManager

    t0 = time.perf_counter()
    try:
        pool = FTPPoolManager.instance().get_pool(
            server.host, server.port, server.username, server.password
        )
        conn = pool.borrow()
        try:
            conn.voidcmd("NOOP")
        finally:
            pool.return_connection(conn)
        ok, detail = True, "pooled NOOP ok"
    except Exception as e:  # ftplib errors don't share one base class
        ok, detail = False, f"{type(e).__name__}: {e}"
    return HealthStatus(server.hostname, "ftp_pool", ok, detail, round((time.perf_counter() - t0) * 1e3, 2))


def check_local_path(target: str, path: str) -> HealthStatus:
    t0 = time.perf_counter()
    ok = os.path.isdir(path) and os.access(path, os.W_OK)
    detail = "writable" if ok else "missing or read-only"
    return HealthStatus(target, "local_path", ok, detail, round((time.perf_counter() - t0) * 1e3, 2))


def kafka_bootstrap(env: dict[str, str] | None = None) -> tuple[str, int]:
    """First host:port of ETL_KAFKA_BOOTSTRAP / KAFKA_BOOTSTRAP_SERVERS,
    default localhost:9092 (reference test_health.py:47)."""
    env = dict(os.environ) if env is None else env
    bootstrap = env.get("ETL_KAFKA_BOOTSTRAP") or env.get("KAFKA_BOOTSTRAP_SERVERS") or "localhost:9092"
    host, _, port = bootstrap.split(",")[0].partition(":")
    return host, int(port or "9092")


def probe_all(
    env: dict[str, str] | None = None, deep: bool = False, timeout: float = DEFAULT_TIMEOUT
) -> list[HealthStatus]:
    """Probe every server declared in the environment plus the Kafka
    broker. deep=True adds pooled-login probes for FTP servers on top
    of plain TCP reachability."""
    env = dict(os.environ) if env is None else env
    out: list[HealthStatus] = []
    for server in discover_servers(env):
        if server.type == "local":
            if server.base_path:
                out.append(check_local_path(server.hostname, server.base_path))
            else:
                # An unset base_path must not silently probe "/" (always
                # writable as root → false healthy); report the misconfig.
                out.append(
                    HealthStatus(server.hostname, "local_path", False, "base_path not configured", 0.0)
                )
            continue
        out.append(check_tcp(server.hostname, server.host, server.port, timeout))
        if deep and server.type == "ftp":
            out.append(check_ftp_pool(server, timeout))
    host, port = kafka_bootstrap(env)
    out.append(check_tcp("kafka", host, port, timeout))
    return out


def healthy(statuses: list[HealthStatus]) -> bool:
    return all(s.healthy for s in statuses)
