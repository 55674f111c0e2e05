"""Transport adapters + per-host frequency limiting.

One ``TransportAdapter`` protocol (reference: utils.py:218-316) with two
implementations:

* :class:`RequestsAdapter` — real HTTP via ``requests`` (import-gated;
  the build sandbox has the lib but no network),
* :class:`SyntheticWebAdapter` — deterministic in-process page server
  keyed by URL (the default for tests/benchmarks; see
  uniparser_ray.sources.synthweb).

``Frequency`` is a from-scratch token-interval limiter with the
observable behavior of the reference's per-host gate: at most ``n``
acquisitions per ``interval`` seconds (reference behavior pinned by
test_parsers.py:1326-1383).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Optional, Tuple

from ..config import EngineConfig

try:
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None


class Frequency:
    """At most n acquisitions per interval seconds (thread-safe)."""

    __slots__ = ("n", "interval", "_lock", "_times")

    def __init__(self, n: int = 0, interval: float = 0):
        self.n = n
        self.interval = interval
        self._lock = threading.Lock()
        self._times: deque = deque()

    def __enter__(self):
        if not self.n or not self.interval:
            return self
        while True:
            with self._lock:
                now = time.monotonic()
                while self._times and now - self._times[0] >= self.interval:
                    self._times.popleft()
                if len(self._times) < self.n:
                    self._times.append(now)
                    return self
                wait = self._times[0] + self.interval - now
            time.sleep(max(wait, 0.001))

    def __exit__(self, *_):
        pass


class NullFrequency:
    def __enter__(self):
        return self

    def __exit__(self, *_):
        pass


class TransportAdapter:
    """Protocol: ``request(**request_args) -> (text, response)``;
    errors are returned as ``(str(err), err)`` — error-as-value, like
    every other stage (reference: utils.py:235-247)."""

    def __enter__(self):
        return self

    def __exit__(self, *_):
        pass

    def request(self, **request_args) -> Tuple[str, object]:
        raise NotImplementedError

    def close(self):
        pass


class RequestsAdapter(TransportAdapter):
    def __init__(self, session=None):
        if _requests is None:
            raise RuntimeError("requests is not installed")
        self.session = session or _requests.Session()

    def request(self, **request_args):
        request_args.setdefault("timeout", EngineConfig.GLOBAL_TIMEOUT)
        encoding = request_args.pop("encoding", None)
        retry = request_args.pop("retry", 0)
        error = None
        for _ in range(retry + 1):
            try:
                resp = self.session.request(**request_args)
                if encoding:
                    resp.encoding = encoding
                return resp.text, resp
            except Exception as err:
                error = err
        return str(error), error

    def close(self):
        self.session.close()


class SyntheticResponse:
    """Response-shaped object for the synthetic web."""

    __slots__ = ("url", "status_code", "headers", "content", "encoding")

    def __init__(self, url: str, status_code: int, content: bytes,
                 headers: Optional[dict] = None):
        self.url = url
        self.status_code = status_code
        self.content = content
        self.headers = headers or {}
        self.encoding = "utf-8"

    @property
    def text(self) -> str:
        return self.content.decode(self.encoding, "replace")

    def __repr__(self):
        return f"<SyntheticResponse [{self.status_code}] {self.url}>"


class FetchError(Exception):
    pass


class SyntheticWebAdapter(TransportAdapter):
    """Deterministic in-process web: pages come from a ``SynthWeb``
    (or any object with ``get(url) -> (status, headers, body_bytes)``)."""

    def __init__(self, web):
        self.web = web

    def request(self, **request_args):
        url = request_args["url"]
        retry = request_args.pop("retry", 0)
        error = None
        for _ in range(retry + 1):
            try:
                status, headers, body = self.web.get(url)
                resp = SyntheticResponse(url, status, body, headers)
                return resp.text, resp
            except Exception as err:
                error = err
        return str(error), error
