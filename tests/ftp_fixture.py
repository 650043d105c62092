"""Minimal in-process FTP server for integration tests.

Implements just the verbs the engine's FTP handler and pool use
(USER/PASS/TYPE/PASV/RETR/STOR/MKD/CWD/NOOP/QUIT) over a real TCP
socket, passive mode only, one thread per control connection. Not a
general server — a test double with real sockets, so ftplib exercises
its actual protocol path (mirrors the reference's FTP integration tier,
tests/test_ftp_integration.py, without external infrastructure).
"""

from __future__ import annotations

import os
import socket
import threading


class MiniFTPServer:
    def __init__(self, root: str, user: str = "u", password: str = "p") -> None:
        self.root = os.path.abspath(root)
        self.user, self.password = user, password
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind(("127.0.0.1", 0))
        self._listener.listen(16)
        self.port = self._listener.getsockname()[1]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self.connect_count = 0

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "MiniFTPServer":
        th = threading.Thread(target=self._accept_loop, daemon=True)
        th.start()
        self._threads.append(th)
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass

    # -- internals ---------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            self.connect_count += 1
            th = threading.Thread(target=self._session, args=(conn,), daemon=True)
            th.start()
            self._threads.append(th)

    def _resolve(self, cwd: str, path: str) -> str:
        joined = path if path.startswith("/") else f"{cwd.rstrip('/')}/{path}"
        full = os.path.abspath(os.path.join(self.root, joined.lstrip("/")))
        if not full.startswith(self.root):
            raise PermissionError(path)
        return full

    def _session(self, conn: socket.socket) -> None:
        rf = conn.makefile("rb")

        def send(line: str) -> None:
            conn.sendall((line + "\r\n").encode())

        def open_data_listener() -> socket.socket:
            d = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            d.bind(("127.0.0.1", 0))
            d.listen(1)
            return d

        send("220 mini ftp ready")
        cwd = "/"
        data_listener: socket.socket | None = None
        authed = False
        try:
            while True:
                raw = rf.readline()
                if not raw:
                    return
                line = raw.decode().strip()
                verb, _, arg = line.partition(" ")
                verb = verb.upper()
                if verb == "USER":
                    send("331 need password" if arg == self.user else "331 need password")
                elif verb == "PASS":
                    authed = arg == self.password
                    send("230 ok" if authed else "530 bad credentials")
                elif not authed:
                    send("530 not logged in")
                elif verb == "TYPE":
                    send("200 ok")
                elif verb == "NOOP":
                    send("200 ok")
                elif verb == "PWD":
                    send(f'257 "{cwd}"')
                elif verb == "CWD":
                    target = self._resolve(cwd, arg)
                    if os.path.isdir(target):
                        cwd = "/" + os.path.relpath(target, self.root).replace("\\", "/")
                        cwd = "/" if cwd == "/." else cwd
                        send("250 ok")
                    else:
                        send("550 no such directory")
                elif verb == "MKD":
                    target = self._resolve(cwd, arg)
                    if os.path.isdir(target):
                        send("550 exists")
                    else:
                        try:
                            os.mkdir(target)
                            send(f'257 "{arg}" created')
                        except FileNotFoundError:
                            send("550 parent missing")
                elif verb == "PASV":
                    if data_listener is not None:
                        data_listener.close()
                    data_listener = open_data_listener()
                    h = "127,0,0,1"
                    p = data_listener.getsockname()[1]
                    send(f"227 entering passive ({h},{p >> 8},{p & 255})")
                elif verb == "RETR":
                    path = self._resolve(cwd, arg)
                    if not os.path.isfile(path):
                        send("550 no such file")
                        continue
                    send("150 opening data")
                    data, _ = data_listener.accept()
                    with open(path, "rb") as fh:
                        data.sendall(fh.read())
                    data.close()
                    send("226 done")
                elif verb == "NLST":
                    path = self._resolve(cwd, arg or ".")
                    if not os.path.isdir(path):
                        send("550 not a directory")
                        continue
                    send("150 opening data")
                    data, _ = data_listener.accept()
                    names = sorted(
                        n for n in os.listdir(path) if os.path.isfile(os.path.join(path, n))
                    )
                    data.sendall(("\r\n".join(names) + "\r\n").encode() if names else b"")
                    data.close()
                    send("226 done")
                elif verb == "SIZE":
                    path = self._resolve(cwd, arg)
                    if not os.path.isfile(path):
                        send("550 no such file")
                    else:
                        send(f"213 {os.path.getsize(path)}")
                elif verb == "STOR":
                    try:
                        path = self._resolve(cwd, arg)
                        send("150 opening data")
                    except PermissionError:
                        send("550 denied")
                        continue
                    data, _ = data_listener.accept()
                    chunks = []
                    while True:
                        b = data.recv(65536)
                        if not b:
                            break
                        chunks.append(b)
                    data.close()
                    try:
                        with open(path, "wb") as fh:
                            fh.write(b"".join(chunks))
                        send("226 done")
                    except FileNotFoundError:
                        send("550 parent missing")
                elif verb == "QUIT":
                    send("221 bye")
                    return
                else:
                    send(f"502 {verb} not implemented")
        except Exception:
            try:
                send("421 server error")
            except OSError:
                pass
        finally:
            if data_listener is not None:
                data_listener.close()
            conn.close()
