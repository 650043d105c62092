"""Thread-safe bounded FTP connection pool, shared per executor.

Semantics parity with the reference pool (/root/reference/src/etl/transfer/
pool.py:44-320), implemented fresh:
- bounded pool per (host, port, username); borrow = reuse → validate
  (NOOP) → or create up to capacity → or block up to max_wait then
  TimeoutError (pool.py:88-160).
- return = requeue, or close when pool is full (pool.py:162-182).
- stale connections are detected by NOOP on borrow and replaced
  (pool.py:212-227); idle_timeout is accepted-but-unenforced BY DEFAULT,
  exactly as the reference (pool.py:59,76 — no eviction loop exists
  there either). Opt-in extension (r4 verdict #7, DEVIATIONS.md):
  `evict_idle=True` (or FTP_POOL_EVICT_IDLE=1) enforces idle_timeout —
  expired idle connections are closed at borrow time, by an explicit
  evict_idle_connections() call, and by a daemon sweeper thread — so a
  long-lived executor does not hold server slots open between waves.
  Default behavior is bit-identical to the reference.
- manager is a process-wide singleton with double-checked locking
  (pool.py:260-306); under Spark that means ONE pool per (server,
  executor python worker), reused across tasks and micro-batches — the
  Spark analogue of the reference's per-consumer-process pool.
"""

from __future__ import annotations

import os
import queue
import threading
from ftplib import FTP
from typing import Callable

DEFAULT_POOL_SIZE = int(os.environ.get("FTP_POOL_SIZE", "4"))
DEFAULT_MAX_WAIT = float(os.environ.get("FTP_POOL_MAX_WAIT", "30.0"))
DEFAULT_IDLE_TIMEOUT = float(os.environ.get("FTP_POOL_IDLE_TIMEOUT", "300.0"))
DEFAULT_CONNECT_TIMEOUT = float(os.environ.get("FTP_CONNECT_TIMEOUT", "30.0"))


class PoolTimeoutError(TimeoutError):
    pass


class FTPConnectionPool:
    """Bounded, validating connection pool for one server."""

    def __init__(
        self,
        host: str,
        port: int,
        username: str,
        password: str,
        pool_size: int = DEFAULT_POOL_SIZE,
        max_wait: float = DEFAULT_MAX_WAIT,
        idle_timeout: float = DEFAULT_IDLE_TIMEOUT,
        connect_timeout: float = DEFAULT_CONNECT_TIMEOUT,
        passive_mode: bool = True,
        factory: Callable[[], FTP] | None = None,
        evict_idle: bool | None = None,
        clock: Callable[[], float] | None = None,
    ) -> None:
        import time

        self._host, self._port = host, port
        self._username, self._password = username, password
        self._pool_size = pool_size
        self._max_wait = max_wait
        # stored-unenforced by default (reference parity); enforced only
        # when evict_idle is opted into
        self.idle_timeout = idle_timeout
        self._connect_timeout = connect_timeout
        self._passive = passive_mode
        self._factory = factory or self._connect
        self._idle: queue.Queue = queue.Queue()  # entries: (conn, returned_at)
        self._created = 0
        self._lock = threading.Lock()
        self._clock = clock or time.monotonic
        if evict_idle is None:
            evict_idle = os.environ.get("FTP_POOL_EVICT_IDLE", "") not in ("", "0", "false")
        self._evict_idle = bool(evict_idle)
        self._closed = False
        if self._evict_idle:
            sweeper = threading.Thread(
                target=self._sweep_loop, name=f"ftp-pool-evict-{host}:{port}", daemon=True
            )
            sweeper.start()

    def _expired(self, returned_at: float) -> bool:
        return self._evict_idle and (self._clock() - returned_at) > self.idle_timeout

    def evict_idle_connections(self) -> int:
        """Close idle connections older than idle_timeout (no-op unless
        evict_idle). Non-expired entries are requeued with their original
        timestamps. Returns the number evicted."""
        if not self._evict_idle:
            return 0
        keep, evicted = [], 0
        while True:
            try:
                conn, returned_at = self._idle.get_nowait()
            except queue.Empty:
                break
            if self._expired(returned_at):
                self._close_quietly(conn)
                with self._lock:
                    self._created -= 1
                evicted += 1
            else:
                keep.append((conn, returned_at))
        for item in keep:
            self._idle.put(item)
        return evicted

    def _sweep_loop(self) -> None:  # pragma: no cover - timing loop; the
        # eviction logic it drives is covered by tests/test_pool.py
        import time

        interval = max(min(self.idle_timeout / 2.0, 30.0), 0.05)
        while not self._closed:
            time.sleep(interval)
            try:
                self.evict_idle_connections()
            except Exception:
                pass

    def _connect(self) -> FTP:
        conn = FTP()
        conn.connect(self._host, self._port, timeout=self._connect_timeout)
        conn.login(self._username, self._password)
        conn.set_pasv(self._passive)
        return conn

    @staticmethod
    def _is_alive(conn: FTP) -> bool:
        try:
            conn.voidcmd("NOOP")
            return True
        except Exception:
            return False

    def _close_quietly(self, conn: FTP) -> None:
        try:
            conn.quit()
        except Exception:
            try:
                conn.close()
            except Exception:
                pass

    def borrow(self) -> FTP:
        """Reuse an idle validated connection, create if below capacity,
        else block up to max_wait for a return."""
        deadline = None
        while True:
            try:
                conn, returned_at = self._idle.get_nowait()
            except queue.Empty:
                conn = None
            if conn is not None:
                if not self._expired(returned_at) and self._is_alive(conn):
                    return conn
                self._close_quietly(conn)
                with self._lock:
                    self._created -= 1
                continue
            with self._lock:
                if self._created < self._pool_size:
                    self._created += 1
                    create = True
                else:
                    create = False
            if create:
                try:
                    return self._factory()
                except Exception:
                    with self._lock:
                        self._created -= 1
                    raise
            # at capacity: block for a returned connection
            import time

            if deadline is None:
                deadline = time.monotonic() + self._max_wait
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise PoolTimeoutError(
                    f"no connection available for {self._host}:{self._port} within {self._max_wait}s"
                )
            try:
                conn, returned_at = self._idle.get(timeout=remaining)
            except queue.Empty:
                raise PoolTimeoutError(
                    f"no connection available for {self._host}:{self._port} within {self._max_wait}s"
                ) from None
            if not self._expired(returned_at) and self._is_alive(conn):
                return conn
            self._close_quietly(conn)
            with self._lock:
                self._created -= 1
            # loop back: capacity freed, we may create fresh

    def return_connection(self, conn: FTP) -> None:
        self._idle.put((conn, self._clock()))

    def discard(self, conn: FTP) -> None:
        """Close a borrowed connection instead of re-pooling it — for
        failures mid-transfer, where the control channel may be
        desynchronized (a pending reply would poison the next borrower's
        NOOP validation)."""
        self._close_quietly(conn)
        with self._lock:
            self._created -= 1

    def close_all(self) -> None:
        self._closed = True  # stops the sweeper (if any) at its next tick
        while True:
            try:
                conn, _returned_at = self._idle.get_nowait()
            except queue.Empty:
                break
            self._close_quietly(conn)
            with self._lock:
                self._created -= 1


class FTPPoolManager:
    """Process-wide singleton registry of pools, keyed host:port:username."""

    _instance: "FTPPoolManager | None" = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._pools: dict[str, FTPConnectionPool] = {}
        self._lock = threading.Lock()

    @classmethod
    def instance(cls) -> "FTPPoolManager":
        if cls._instance is None:
            with cls._instance_lock:
                if cls._instance is None:
                    cls._instance = cls()
        return cls._instance

    def get_pool(self, host: str, port: int, username: str, password: str, **kw) -> FTPConnectionPool:
        key = f"{host}:{port}:{username}"
        pool = self._pools.get(key)
        if pool is None:
            with self._lock:
                pool = self._pools.get(key)
                if pool is None:
                    pool = FTPConnectionPool(host, port, username, password, **kw)
                    self._pools[key] = pool
        return pool

    def close_all(self) -> None:
        with self._lock:
            for pool in self._pools.values():
                pool.close_all()
            self._pools.clear()
