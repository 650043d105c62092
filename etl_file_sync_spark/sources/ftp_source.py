"""FTP batch data source (Spark 4 Python Data Source API).

The reference treats FTP as a per-job side effect inside its consumer
(`/root/reference/src/etl/transfer/ftp.py:115-150` download path); this
module promotes it to a first-class SCAN: `spark.read.format("ftpfiles")`
lists a remote directory once on the driver, splits the file set into
input partitions, and executors fetch their files in parallel over their
own FTP connections — the binaryFile-style source the reference never
had, with the same passive-mode/timeout posture as pipeline/handlers.py.

Scale shape: listing is metadata (one NLST on the driver); bytes move
executor-side only, `files_per_partition` bounds task granularity, and a
partition's files are fetched over ONE control connection (connection
setup amortized across the partition, the pooling lesson from
pipeline/pool.py applied to scans).

All classes are defined inside a factory so cloudpickle serializes them
BY VALUE ('<locals>' qualname): registered data-source classes travel to
a planner Python worker that ignores addPyFile, so a by-reference pickle
dies with ModuleNotFoundError whenever the driving process imported this
repo via sys.path alone (same gotcha as replay_stream_source.py).

Options: host, port (21), user, password, path (remote dir), passive
(true), files_per_partition (16), timeout_s (30).
"""

from __future__ import annotations

FTP_FILES_SCHEMA = "path string, size bigint, content binary"


def make_ftp_files_source() -> type:
    """Build the ftpfiles DataSource class, picklable by value."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    schema_str = FTP_FILES_SCHEMA

    def _connect(opts):
        import ftplib

        ftp = ftplib.FTP()
        ftp.connect(
            opts["host"], int(opts.get("port", 21)), timeout=float(opts.get("timeout_s", 30))
        )
        ftp.login(opts.get("user", "anonymous"), opts.get("password", ""))
        ftp.set_pasv(str(opts.get("passive", "true")).lower() != "false")
        return ftp

    class FTPFilePartition(InputPartition):
        def __init__(self, names: list[str]):
            self.names = names

    class FTPFilesReader(DataSourceReader):
        def __init__(self, options):
            self.options = dict(options)
            if "host" not in self.options or "path" not in self.options:
                raise ValueError("ftpfiles source requires 'host' and 'path' options")

        def partitions(self):
            ftp = _connect(self.options)
            try:
                names = sorted(ftp.nlst(self.options["path"]))
            finally:
                ftp.quit()
            per = int(self.options.get("files_per_partition", 16))
            groups = [names[i : i + per] for i in range(0, len(names), per)]
            return [FTPFilePartition(g) for g in groups] or [FTPFilePartition([])]

        def read(self, partition):
            if not partition.names:
                return
            base = self.options["path"].rstrip("/")
            ftp = _connect(self.options)
            try:
                for name in partition.names:
                    # NLST may return bare names or full paths depending on server
                    remote = name if name.startswith("/") else f"{base}/{name}"
                    chunks: list[bytes] = []
                    ftp.retrbinary(f"RETR {remote}", chunks.append)
                    content = b"".join(chunks)
                    yield (remote, len(content), content)
            finally:
                try:
                    ftp.quit()
                except Exception:
                    ftp.close()

    class FTPFilesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "ftpfiles"

        def schema(self) -> str:
            return schema_str

        def reader(self, schema):
            return FTPFilesReader(self.options)

    return FTPFilesDataSource


FTPFilesDataSource = make_ftp_files_source()


def register_ftp_source(spark) -> None:
    """Register the ftpfiles format on a session (idempotent)."""
    spark.dataSource.register(FTPFilesDataSource)
