"""HTTP transport adapter for the REST-snapshot sources.

The reference fetches its dims with `requests.get(...)` and falls back
to constants on any non-200 (src/mm_calls.py:59-66). The engine keeps
that seam abstract — :mod:`sources.rest` accepts any zero-arg callable
— and this module provides the production-shaped adapter: URL + retry
+ status-check + JSON parse, with the actual byte-mover (``http_get``)
injectable so tests run offline and production drops in a urllib/
httpx/requests client without touching engine code.

Driver-side by design: these are KB-MB dim fetches (ladder,
tournaments, balance), not data-plane I/O — see sources/rest.py.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

# (status_code, body_bytes) — the minimal surface of any HTTP client.
HttpGet = Callable[[str], tuple[int, bytes]]


class TransportError(RuntimeError):
    """All attempts failed; snapshot_source turns this into the
    constants-fallback branch (reference mm_calls.py:62-64)."""


def _default_http_get(url: str) -> tuple[int, bytes]:
    """Stdlib urllib getter (no extra deps). Only used when no client
    is injected — tests always inject a fake."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a status
        return e.code, e.read()


class HttpTransport:
    """A :data:`sources.rest.Transport` that GETs ``url`` and parses
    JSON, retrying transient failures ``retries`` times with linear
    backoff before raising :class:`TransportError`.

    Non-200 responses and client exceptions both count as failed
    attempts — the reference treats them identically (`!= 200 ->
    backup`, mm_calls.py:62-64).
    """

    def __init__(
        self,
        url: str,
        http_get: HttpGet | None = None,
        retries: int = 2,
        backoff_s: float = 0.1,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.url = url
        self.http_get = http_get or _default_http_get
        self.retries = retries
        self.backoff_s = backoff_s
        self.sleep = sleep

    def __call__(self) -> object:
        last: str = "no attempt made"
        for attempt in range(self.retries + 1):
            if attempt > 0:
                self.sleep(self.backoff_s * attempt)
            try:
                status, body = self.http_get(self.url)
            except Exception as e:  # noqa: BLE001 - client error = failed attempt
                last = f"client error: {e}"
                continue
            if status == 200:
                return json.loads(body)
            last = f"status {status}"
        raise TransportError(
            f"GET {self.url} failed after {self.retries + 1} attempts ({last})"
        )
