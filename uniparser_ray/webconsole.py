"""HTTP rule console — the reference web UI's server surface
(reference: uniparser/webui.py:48-134, fastapi_ui/views.py:53-135) on
the stdlib ``http.server`` (no web framework in the sandbox).

The console is a driver-side dev tool, not a data-plane component: one
process, one :class:`RuleVM`, download-once / parse-many against a
sticky per-server context — exactly the reference's workflow:

* ``POST /request``    body = CrawlerRule JSON → download once, stash
  ``resp``/``request_args`` in the server context, return the text.
* ``POST /parse``      body = ``{"input_object": …, "rule": <rule JSON
  string>}`` → parse against the sticky context, return
  ``{type, data, json}``.
* ``POST /curl_parse`` body = curl command string → request_args dict.
* ``GET  /``           parser registry: name → docstring + the input
  callback names (the data the reference's index template renders).

Run: ``python -m uniparser_ray serve --port 8080``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .config import EngineConfig
from .rulevm.request import ensure_request
from .rulevm.rules import CrawlerRule
from .rulevm.vm import InputCallbacks, RuleVM


class ConsoleState:
    """One VM + one sticky context per server (reference webui.py keeps
    a module-global ``CONTEXT`` refreshed by each /request)."""

    def __init__(self, request_adapter=None):
        self.vm = RuleVM()
        if request_adapter is not None:
            self.vm.request_adapter = request_adapter
        self.context: dict = EngineConfig.init_context()
        self.lock = threading.Lock()

    # -- endpoint logic (framework-free, directly testable) ------------

    def do_request(self, payload: dict) -> dict:
        rule = CrawlerRule(**payload)
        regex = rule["regex"]
        url = rule["request_args"].get("url", "")
        if not regex or not rule.check_regex(url):
            msg = (f"Download completed, but the regex `{regex}` does not "
                   f"match the given url: {url}")
        else:
            msg = ""
        input_object, resp = self.vm.download(rule)
        with self.lock:
            self.context.clear()
            self.context.update(EngineConfig.init_context())
            self.context["request_args"] = rule["request_args"]
            self.context["resp"] = resp
        headers = getattr(resp, "headers", {}) or {}
        text = str(input_object)
        status_code = getattr(resp, "status_code", 0)
        return {
            "text": text,
            "status": (f"[{status_code}] | "
                       f"Content-Length={headers.get('Content-Length', len(text))} | "
                       f"Content-Type={headers.get('Content-Type', '')}"),
            "ok": status_code in range(200, 300),
            "msg": msg,
        }

    def do_parse(self, payload: dict) -> dict:
        input_object = payload["input_object"]
        rule_json = payload["rule"]
        try:
            rule = CrawlerRule.loads(rule_json)
            with self.lock:
                context = self.context
            result = self.vm.parse(input_object, rule, context=context)
            try:
                json_result = json.dumps(result, default=repr, indent=2,
                                         ensure_ascii=False)
            except Exception as e:
                json_result = repr(e)
            return {"type": str(type(result)), "data": repr(result),
                    "json": json_result}
        except Exception as err:
            import traceback
            return {"type": str(type(err)), "data": repr(err),
                    "json": traceback.format_exc()}

    def do_curl_parse(self, body: str) -> dict:
        result = ensure_request(body)
        if isinstance(body, str) and body.startswith("http"):
            result.setdefault("headers",
                              {"User-Agent": EngineConfig.DEFAULT_UA})
        return {"result": result, "ok": True}

    def do_index(self) -> dict:
        docs = {name: (parser.__doc__ or "").strip()
                for name, parser in self.vm.parsers.items()}
        return {"parsers": sorted(docs),
                "docs": docs,
                "cb_names": " | ".join(InputCallbacks._CALLBACKS)}


class _Handler(BaseHTTPRequestHandler):
    state: ConsoleState = None  # injected by make_server

    def _reply(self, obj, code=200):
        body = json.dumps(obj, default=repr, ensure_ascii=False).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        length = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(length)

    def do_GET(self):
        if self.path.rstrip("/") in ("", "/"):
            self._reply(self.state.do_index())
        else:
            self._reply({"error": f"unknown path {self.path!r}"}, 404)

    def do_POST(self):
        raw = self._body()
        try:
            if self.path == "/request":
                self._reply(self.state.do_request(json.loads(raw)))
            elif self.path == "/parse":
                self._reply(self.state.do_parse(json.loads(raw)))
            elif self.path == "/curl_parse":
                self._reply(self.state.do_curl_parse(raw.decode("utf-8")))
            else:
                self._reply({"error": f"unknown path {self.path!r}"}, 404)
        except Exception as e:  # error-as-value like every other surface
            self._reply({"error_type": type(e).__name__, "error": str(e)},
                        500)

    def log_message(self, fmt, *args):  # quiet by default
        pass


def make_server(host="127.0.0.1", port=8080,
                request_adapter=None) -> ThreadingHTTPServer:
    """Build (don't start) the console server; ``request_adapter`` lets
    tests plug the synthetic web in place of real HTTP."""
    state = ConsoleState(request_adapter=request_adapter)
    handler = type("ConsoleHandler", (_Handler,), {"state": state})
    return ThreadingHTTPServer((host, port), handler)


def serve(host="127.0.0.1", port=8080, request_adapter=None):
    server = make_server(host, port, request_adapter)
    try:
        server.serve_forever()
    finally:
        server.server_close()
