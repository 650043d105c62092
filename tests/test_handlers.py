"""Transfer handler + factory tests (reference: tests/test_transfer_factory.py,
tests/test_transfer_local.py)."""

from __future__ import annotations

import pytest

from etl_file_sync_spark.pipeline.config import ServerConfig
from etl_file_sync_spark.pipeline.handlers import BaseTransfer, LocalTransfer, TransferFactory


def test_factory_case_insensitive():
    h = TransferFactory.create(ServerConfig(hostname="X", type="LOCAL"))
    assert isinstance(h, LocalTransfer)


def test_factory_unknown_type_lists_supported():
    with pytest.raises(ValueError) as ei:
        TransferFactory.create(ServerConfig(hostname="X", type="sftp"))
    msg = str(ei.value)
    assert "ftp" in msg and "local" in msg


def test_factory_registration_plugin_point():
    class Dummy(BaseTransfer):
        def download(self, r, l):  # pragma: no cover
            pass

        def upload(self, l, r):  # pragma: no cover
            pass

    TransferFactory.register("dummy", Dummy)
    try:
        assert isinstance(TransferFactory.create(ServerConfig(hostname="X", type="Dummy")), Dummy)
    finally:
        TransferFactory._registry.pop("dummy", None)


def test_local_roundtrip(tmp_path):
    src = tmp_path / "in" / "f.bin"
    src.parent.mkdir()
    src.write_bytes(b"\x00\x01payload")
    h = LocalTransfer(ServerConfig(hostname="X", type="local"))
    staged = tmp_path / "stage" / "tmp.bin"
    h.download(str(src), str(staged))
    out = tmp_path / "deep" / "nested" / "out.bin"
    h.upload(str(staged), str(out))
    assert out.read_bytes() == b"\x00\x01payload"


def test_local_base_path_resolution(tmp_path):
    (tmp_path / "base").mkdir()
    (tmp_path / "base" / "rel.txt").write_text("hi")
    h = LocalTransfer(ServerConfig(hostname="X", type="local", base_path=str(tmp_path / "base")))
    dst = tmp_path / "got.txt"
    h.download("rel.txt", str(dst))
    assert dst.read_text() == "hi"


def test_local_missing_source():
    h = LocalTransfer(ServerConfig(hostname="X", type="local"))
    with pytest.raises(FileNotFoundError):
        h.download("/no/such/file", "/tmp/whatever-out")
    with pytest.raises(FileNotFoundError):
        h.upload("/no/such/file", "/tmp/whatever-out")
