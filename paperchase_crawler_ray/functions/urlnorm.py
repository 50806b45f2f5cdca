"""URL canonicalization (SURVEY.md M1-M3) — RFC 3986 normalization.

This module defines the *identity* of a URL for the whole engine: the
seen-set, dedup, politeness partitioning and crawl-ordering all key off
``canonicalize()`` / ``url_hash64()``. It is pure Python (no Ray) so the
distributed engine and the single-threaded oracle crawler share one
implementation of the spec.

Rules (M1, idempotent — property-tested in tests/test_urlnorm.py):
  * lowercase scheme and host; strip a trailing dot on the host
  * strip default ports (http:80, https:443)
  * resolve dot-segments in the path (RFC 3986 §5.2.4)
  * empty path -> "/"
  * strip the fragment
  * percent-escapes: decode unreserved characters, uppercase the rest
  * query params stable-sorted by (key, value); empty query dropped
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    """Normalize percent-escapes: decode unreserved, uppercase hex digits.

    Malformed escapes (truncated / non-hex) are left verbatim.
    """
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1 : i + 3]
            try:
                ch = chr(int(hx, 16))
            except ValueError:
                out.append(c)
                i += 1
                continue
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments (segment-stack formulation)."""
    segments = path.split("/")
    output: list[str] = []
    for seg in segments:
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
        else:
            output.append(seg)
    if segments and segments[-1] in (".", "..") and (not output or output[-1] != ""):
        output.append("")  # trailing "." / ".." leaves a trailing slash
    return "/".join(output)


def canonicalize(url: str) -> str:
    """Canonical form of ``url`` (the M1 spec). Idempotent."""
    url = url.strip()
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    elif not path.startswith("/"):
        path = "/" + path
    query = ""
    if parts.query:
        pairs = []
        for kv in parts.query.split("&"):
            if not kv:
                continue
            pairs.append(_norm_pct(kv))
        # stable sort by (key, value) — split once on "="
        pairs.sort(key=lambda kv: (kv.split("=", 1)[0], kv))
        query = "&".join(pairs)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


def url_hash64(canon_url: str) -> int:
    """Deterministic signed-64-bit hash of a canonical URL (M2).

    Uses blake2b(digest_size=8) — stable across processes and machines,
    unlike Python's builtin ``hash``.
    """
    d = hashlib.blake2b(canon_url.encode("utf-8"), digest_size=8).digest()
    v = int.from_bytes(d, "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def extract_host(canon_url: str) -> str:
    """Host part of a canonical URL (M3) — politeness partition key."""
    # canonical form is scheme://host[:port]/...
    rest = canon_url.split("://", 1)[-1]
    hostport = rest.split("/", 1)[0]
    return hostport.split(":", 1)[0]


def registrable_domain(host: str) -> str:
    """Cheap registrable-domain heuristic (last two labels)."""
    labels = host.rsplit(".", 2)
    return ".".join(labels[-2:]) if len(labels) >= 2 else host
