"""The ftpfiles Python data source against the in-process FTP server:
parallel partitioned scan, byte-exact content, option validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_file_sync_spark.sources.ftp_source import register_ftp_source
from tests.ftp_fixture import MiniFTPServer


@pytest.fixture()
def ftp_tree(tmp_path):
    root = tmp_path / "ftp_root"
    (root / "pub").mkdir(parents=True)
    files = {}
    for i in range(5):
        body = (f"file-{i}-" * (i + 1)).encode()
        (root / "pub" / f"f{i}.bin").write_bytes(body)
        files[f"/pub/f{i}.bin"] = body
    srv = MiniFTPServer(str(root)).start()
    yield srv, files
    srv.stop()


def test_ftp_source_reads_all_files_byte_exact(spark, ftp_tree):
    srv, files = ftp_tree
    register_ftp_source(spark)
    df = (
        spark.read.format("ftpfiles")
        .option("host", "127.0.0.1")
        .option("port", srv.port)
        .option("user", "u")
        .option("password", "p")
        .option("path", "/pub")
        .option("files_per_partition", 2)
        .load()
    )
    rows = {r.path: bytes(r.content) for r in df.collect()}
    assert rows == files
    sizes = {r.path: r.size for r in df.collect()}
    assert sizes == {p: len(b) for p, b in files.items()}
    # 5 files at 2/partition -> 3 input partitions (parallel scan, not 1 task)
    assert df.rdd.getNumPartitions() == 3


def test_ftp_source_composes_with_sql(spark, ftp_tree):
    srv, files = ftp_tree
    register_ftp_source(spark)
    df = (
        spark.read.format("ftpfiles")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("path", "/pub")
        .load()
    )
    agg = df.agg(F.count(F.lit(1)).alias("n"), F.sum("size").alias("bytes")).first()
    assert agg.n == 5
    assert agg.bytes == sum(len(b) for b in files.values())


def test_ftp_source_requires_host_and_path(spark):
    register_ftp_source(spark)
    with pytest.raises(Exception, match="host|path"):
        spark.read.format("ftpfiles").option("host", "127.0.0.1").load().collect()
