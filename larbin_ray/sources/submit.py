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
class SubmissionWatcher:
    """Incremental reader of the watched seed file."""

    path: str
    _offset: int = 0
    _partial: bytes = b""
    _header: tuple[int, int, bool] | None = None   # (prio_class, depth, test)

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
        data = self._partial + chunk
        lines = data.split(b"\n")
        self._partial = lines.pop()     # incomplete tail (b"" if newline-terminated)
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
