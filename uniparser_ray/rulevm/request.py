"""Request-args utilities: ensure_request / curlparse / get_host.

Semantics match the reference (reference: uniparser/utils.py:58-215).
``get_host`` is also the engine's frontier partition-key extractor.
"""

from __future__ import annotations

import re
from argparse import ArgumentParser
from codecs import escape_decode
from shlex import split as shlex_split
from urllib.parse import quote_plus, urlparse

from ..config import EngineConfig
from .parsers import decode_as_base64, encode_as_base64


def get_host(url, default=None):
    """netloc of an http(s) URL, else ``default``
    (reference: utils.py:58-62)."""
    if url and url.startswith("http"):
        return urlparse(url).netloc
    return default


class _CurlArgs:
    parser = ArgumentParser(add_help=False)
    parser.add_argument("curl")
    parser.add_argument("--url", default="")
    parser.add_argument("-X", "--request", default="get")
    parser.add_argument("-A", "--user-agent")
    parser.add_argument("-e", "--referer")
    parser.add_argument("-u", "--user")
    parser.add_argument("-x", "--proxy")
    parser.add_argument("-d", "--data", "--data-raw")
    parser.add_argument("-F", "--form", "--form-string")
    parser.add_argument("--data-binary")
    parser.add_argument("--data-urlencode")
    parser.add_argument("-I", "--head", action="store_true")
    parser.add_argument("-L", "--location", action="store_true")
    parser.add_argument("--retry-max-time", type=int, default=0)
    parser.add_argument("--connect-timeout", type=float)
    parser.add_argument("-m", "--max-time", type=float)
    parser.add_argument("-H", "--header", action="append", default=[])
    parser.add_argument("--compressed", action="store_true")


_ESCAPE_SIG = "b2c1f5a97cdd4f83a6c9a7f1e2d30b44"


def curlparse(string, encoding="utf-8", remain_unknown_args=False) -> dict:
    """curl command string -> request_args dict
    (reference: utils.py:65-178)."""

    def unescape(s):
        if s.startswith(_ESCAPE_SIG):
            return decode_as_base64(s[len(_ESCAPE_SIG):], encoding=encoding)
        return s

    if string.startswith("http"):
        return {"url": string, "method": "get"}
    for arg in re.findall(r"\$'[\s\S]*(?<!\\)'", string):
        unescaped = escape_decode(bytes(arg[2:-1], encoding))[0].decode(encoding)
        string = string.replace(
            arg, "'{}{}'".format(_ESCAPE_SIG, encode_as_base64(unescaped, encoding=encoding)))
    args, unknown = _CurlArgs.parser.parse_known_args(shlex_split(string.strip()))
    request_args: dict = {}
    headers: dict = {}
    request_args["url"] = unescape(args.url)
    if not request_args["url"]:
        for arg in unknown:
            if re.match(r"https?://", arg):
                request_args["url"] = arg
                break
    for header in args.header:
        key, value = unescape(header).split(":", 1)
        headers[key.title()] = value.strip()
    if args.user_agent:
        headers["User-Agent"] = unescape(args.user_agent)
    if args.referer:
        headers["Referer"] = args.referer
    if headers:
        request_args["headers"] = headers
    if args.user:
        request_args["auth"] = (unescape(args.user).split(":", 1) + [""])[:2]
    data = args.data or args.data_binary or args.form
    if args.data_urlencode:
        data = quote_plus(args.data_urlencode)
    if data:
        args.request = "post"
        request_args["data"] = unescape(data).encode(encoding)
    request_args["method"] = args.request.lower()
    if args.head:
        request_args["method"] = "head"
    if args.connect_timeout and args.max_time:
        request_args["timeout"] = (args.connect_timeout, args.max_time)
    elif args.connect_timeout:
        request_args["timeout"] = args.connect_timeout
    elif args.max_time:
        request_args["timeout"] = args.max_time
    if remain_unknown_args:
        request_args["unknown_args"] = unknown
    if args.location:
        request_args["allow_redirects"] = True
    if args.retry_max_time:
        request_args["retry"] = args.retry_max_time
    return request_args


def ensure_request(request) -> dict:
    """url-str | curl-str | json-str | dict -> request_args dict with
    lowercased method (reference: utils.py:181-215).

    >>> ensure_request('http://test.com')
    {'method': 'get', 'url': 'http://test.com'}
    >>> ensure_request({'url': 'http://test.com'})
    {'url': 'http://test.com', 'method': 'get'}
    """
    result: dict = {}
    if isinstance(request, dict):
        result = request
    elif isinstance(request, str):
        request = request.strip()
        if request.startswith("http"):
            result = {"method": "get", "url": request}
        elif request.startswith("curl "):
            result = curlparse(request)
        else:
            try:
                result = EngineConfig.json_loads(request)
            except EngineConfig.JSONDecodeError:
                pass
    else:
        return result
    if result:
        result["method"] = result.setdefault("method", "get").lower()
    return result
