"""Live URL-submission surface — the batch analog of the reference's
TCP input port (/root/reference/src/io/input.cxx:60-187).

The reference accepts connections whose first line is
``priority:P depth:D test:T``; every following line is a URL processed
under that header: parse at depth D; if T != 0, ``seen->testSet`` (admit
only if new); if T == 0, ``seen->set`` UNCONDITIONALLY and enqueue even
when already seen (input.cxx:141-160 — the "set without test" branch);
P != 0 routes to ``URLsPriority``, P == 0 to ``URLsDisk``.

Batch emulation: a *watched file* drained at tick starts.  The file is a
sequence of blocks — a header line followed by URL lines; a new header
line switches state (the file analog of a new connection); URL lines
before any header are dropped (the reference answers "Incorrect input"
and closes).  Only complete (newline-terminated) lines are consumed —
a trailing partial line stays buffered exactly like the socket
``readline`` (input.cxx:34-57); header state persists across polls.

Priority mapping: P != 0 -> admission class 0 (the engine's priority
class, K5 specificSearch routing — the ``URLsPriority`` analog);
P == 0 -> class 1 (ordinary links / ``URLsDisk``).  Priority orders the
tested-admission lexsort; forced (test=0) submissions enqueue in
submission order like the reference's sequential ``put``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

# sscanf("priority:%d depth:%u test:%u") equivalent: %d is signed, %u
# unsigned; a scanf space matches any run of whitespace (or none)
_HEADER_RE = re.compile(rb"^priority:\s*(-?\d+)\s+depth:\s*(\d+)\s+test:\s*(\d+)\s*$")


@dataclass
class Submission:
    url: str
    depth: int
    prio: int           # admission class: 0 priority, 1 normal
    test: bool          # False => set-without-test (forced enqueue)


@dataclass
class ProtocolState:
    """The header/url line state machine of ONE input stream (a watched
    file, or one socket connection) — input.cxx:34-187 semantics:
    complete lines only (a trailing partial stays buffered), header
    lines switch state, url lines before any header are dropped."""

    _partial: bytes = b""
    _header: tuple[int, int, bool] | None = None   # (prio_class, depth, test)

    def feed(self, chunk: bytes) -> list[Submission]:
        data = self._partial + chunk
        lines = data.split(b"\n")
        self._partial = lines.pop()     # incomplete tail (b"" if terminated)
        out: list[Submission] = []
        for line in lines:
            line = line.strip(b"\r")
            if not line:
                continue
            m = _HEADER_RE.match(line)
            if m is not None:
                p, d, t = int(m.group(1)), int(m.group(2)), int(m.group(3))
                self._header = (0 if p != 0 else 1, d, t != 0)
                continue
            if self._header is None:
                continue    # url before any header: dropped (input.cxx:118-124)
            prio, depth, test = self._header
            out.append(Submission(line.decode("latin-1"), depth, prio, test))
        return out


@dataclass
class SubmissionWatcher:
    """Incremental reader of the watched seed file."""

    path: str
    _offset: int = 0
    _state: ProtocolState = field(default_factory=ProtocolState)

    def drain(self) -> list[Submission]:
        """Consume newly appended complete lines; return submissions in
        file order."""
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return []
        if size <= self._offset:
            return []
        with open(self.path, "rb") as f:
            f.seek(self._offset)
            chunk = f.read()
        self._offset += len(chunk)
        return self._state.feed(chunk)


class SubmissionServer:
    """The reference's TCP input port for real (io/input.cxx:252-284
    binds and listens; :60-187 serves connections): a localhost daemon
    thread accepting connections, each with its OWN ProtocolState (a
    new connection starts headerless, like a fresh socket in the
    reference), queueing submissions in arrival order.  The crawl loop
    drains the queue at tick starts — the same cadence as the watched
    file, so both surfaces share one admission path
    (crawl._drain_submissions).

    ``bytes_received`` counts bytes AFTER their lines were parsed into
    the queue; a test/feed client that knows how many bytes it sent can
    ``wait_bytes`` for deterministic handoff without sleeping."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import socket
        import threading
        self._sock = socket.create_server((host, port))
        self._sock.setblocking(False)
        self.host, self.port = self._sock.getsockname()[:2]
        self._queue: list[Submission] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._bytes = 0
        self._cond = threading.Condition(self._lock)
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="larbin-submit-server")
        self._thread.start()

    @property
    def bytes_received(self) -> int:
        with self._lock:
            return self._bytes

    def wait_bytes(self, n: int, timeout: float = 10.0) -> bool:
        """Block until >= n total bytes have been received AND parsed."""
        with self._cond:
            return self._cond.wait_for(lambda: self._bytes >= n, timeout)

    def drain(self) -> list[Submission]:
        with self._lock:
            out, self._queue = self._queue, []
        return out

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close()

    def _serve(self) -> None:
        import selectors
        sel = selectors.DefaultSelector()
        sel.register(self._sock, selectors.EVENT_READ, None)
        states: dict = {}
        try:
            while not self._stop.is_set():
                for key, _ev in sel.select(timeout=0.05):
                    if key.data is None:          # the listener
                        try:
                            conn, _addr = self._sock.accept()
                        except OSError:
                            continue
                        conn.setblocking(False)
                        states[conn] = ProtocolState()
                        sel.register(conn, selectors.EVENT_READ, conn)
                        continue
                    conn = key.data
                    try:
                        chunk = conn.recv(1 << 16)
                    except (BlockingIOError, InterruptedError):
                        continue
                    except OSError:
                        chunk = b""
                    if chunk:
                        subs = states[conn].feed(chunk)
                        with self._cond:
                            self._queue.extend(subs)
                            self._bytes += len(chunk)
                            self._cond.notify_all()
                    else:                          # EOF: drop any partial
                        sel.unregister(conn)
                        conn.close()
                        del states[conn]
        finally:
            for conn in list(states):
                conn.close()
            sel.close()
