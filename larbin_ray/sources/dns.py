"""Fixture DNS — a pure function standing in for the reference's adns
resolver (site.cxx:212-296) so that crawls are deterministic and
network-free.

Semantics mirrored from ``NamedSite::newQuery`` / ``dnsAns``:

- a host whose first char is a digit is treated as numbers-and-dots
  notation (site.cxx:225-242): parseable => its own IP, otherwise
  ``errorDns`` (e.g. ``9bad``);
- everything else resolves deterministically from the *registered
  domain* (last two labels), so sibling subdomains share an IP — this
  exercises the shared-IP politeness queue (IPSite keyed by resolved
  address, site.cxx:424-436);
- special first labels simulate failures: ``nodns*`` => NXDOMAIN
  (``errorDns`` -> noDNS/fastNoDns), ``noconn*`` => resolves but every
  connection fails (``noConnDns`` -> noConnection/fastNoConn).

A real deployment swaps this module for a resolver actor; the scheduler
shards only see the ``resolve()`` interface.
"""

from __future__ import annotations

import hashlib
import socket


def registered_domain(host: str) -> str:
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def resolve(host: str) -> tuple[str, str | None]:
    """-> (status, ip) with status in {"ok", "error", "noconn"}."""
    if host[:1].isdigit():
        try:
            socket.inet_aton(host)
            return "ok", host
        except OSError:
            return "error", None
    first = host.split(".", 1)[0]
    if first.startswith("nodns"):
        return "error", None
    d = hashlib.md5(registered_domain(host).encode()).digest()
    ip = f"10.{d[0]}.{d[1]}.{d[2]}"
    if first.startswith("noconn"):
        return "noconn", ip
    return "ok", ip
