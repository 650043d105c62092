"""Environment-driven configuration, parity with the reference loader.

- Server lookup from env vars ``{HOSTNAME}_{PROPERTY}``, case-insensitive
  hostname, port default 21, bad port -> error:
  /root/reference/src/etl/config.py:92-130, .env.example:27-41.
- DLQ topic naming ``f"{topic}{suffix}"`` (default suffix ``-dlq``):
  /root/reference/src/etl/config.py:76-85.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_file_sync_spark.localrel import local_rows_df
from etl_file_sync_spark.pipeline.schemas import SERVER_SCHEMA

DEFAULT_DLQ_SUFFIX = "-dlq"
DEFAULT_FTP_PORT = 21


@dataclass(frozen=True)
class ServerConfig:
    hostname: str
    type: str
    host: str = ""
    port: int = DEFAULT_FTP_PORT
    username: str = ""
    password: str = ""
    base_path: str = ""


class ConfigError(ValueError):
    pass


def get_server_config(hostname: str, env: dict[str, str] | None = None) -> ServerConfig:
    """Look up a server by symbolic hostname (case-insensitive) in env vars.

    Unknown hostname or unparseable port raises ConfigError — which the
    pipeline routes to the DLQ, never crashes on (reference behavior:
    consumer.py:126-134).
    """
    env = dict(os.environ) if env is None else env
    key = hostname.upper()
    srv_type = env.get(f"{key}_TYPE")
    if not srv_type:
        raise ConfigError(f"unknown server {hostname!r}: no {key}_TYPE configured")
    port_raw = env.get(f"{key}_PORT", str(DEFAULT_FTP_PORT))
    try:
        port = int(port_raw)
    except ValueError as exc:
        raise ConfigError(f"invalid port for {hostname!r}: {port_raw!r}") from exc
    return ServerConfig(
        hostname=key,
        type=srv_type.lower(),
        host=env.get(f"{key}_HOST", ""),
        port=port,
        username=env.get(f"{key}_USER", ""),
        password=env.get(f"{key}_PASS", ""),
        base_path=env.get(f"{key}_BASE_PATH", ""),
    )


def discover_servers(env: dict[str, str] | None = None) -> list[ServerConfig]:
    """All servers declared in the environment (every ``X_TYPE`` var)."""
    env = dict(os.environ) if env is None else env
    out = []
    for k in sorted(env):
        if k.endswith("_TYPE") and env[k]:
            try:
                out.append(get_server_config(k[: -len("_TYPE")], env))
            except ConfigError:
                continue
    return out


def servers_dataframe(
    spark: SparkSession, servers: list[ServerConfig] | None = None, env: dict[str, str] | None = None
) -> DataFrame:
    """The server-config dimension as a (tiny, broadcastable) DataFrame."""
    servers = discover_servers(env) if servers is None else servers
    rows = [
        (s.hostname.upper(), s.type, s.host, s.port, s.username, s.password, s.base_path) for s in servers
    ]
    # LocalRelation, not createDataFrame: this dimension is broadcast-
    # joined into EVERY manifest batch, and a list-built frame scans as
    # a pickled Python RDD whose broadcast build blocks a stage of tasks
    # on Python workers (etl_file_sync_spark/localrel.py)
    return local_rows_df(
        spark,
        rows,
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in SERVER_SCHEMA.fields),
    )


def get_dlq_topic(topic: str, suffix: str | None = None) -> str:
    """DLQ topic for a source topic (config.py:76-85 parity)."""
    suffix = os.environ.get("DLQ_TOPIC_SUFFIX", DEFAULT_DLQ_SUFFIX) if suffix is None else suffix
    return f"{topic}{suffix}"
