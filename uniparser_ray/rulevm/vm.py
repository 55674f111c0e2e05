"""The rule VM: chain folding, rule-tree recursion, context threading.

Pure-Python, zero-Ray conformance kernel
(reference: uniparser/parsers.py:1240-1393).  The Ray engine wraps one
``RuleVM`` per map-batches actor; rules for one page always evaluate in
one task in declaration order, preserving the reference's intra-document
semantics (``context['parse_result']`` cross-field references,
``__object__`` rebinding, ``__schema__`` gating, ``iter_parse_child``
fan-out).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Union

from ..config import EngineConfig
from ..exceptions import InvalidSchemaError, UnknownParserNameError
from . import dom
from .parsers import PARSER_REGISTRY, BaseParser
from .request import get_host
from .rules import CrawlerRule, ParseRule
from .transport import (AsyncFrequency, AsyncTransportAdapter, Frequency,
                        NullAsyncFrequency, NullFrequency, TransportAdapter)

_NULL_ASYNC_FREQUENCY = NullAsyncFrequency()


def _sniff_decode(content: bytes, declared: str = None) -> str:
    """bytes -> str for the content-mode callbacks.  The reference hands
    raw bytes to bs4/selectolax which sniff the in-document charset
    (utils.py:759-773); our DOM engine takes str, so sniff here: BOM,
    then ``<meta charset=…>`` / ``<?xml encoding=…?>`` declaration in
    the head bytes, then the response-declared encoding, then utf-8."""
    import codecs
    import re as _re

    if not isinstance(content, (bytes, bytearray)):
        return content
    for bom, enc in ((codecs.BOM_UTF8, "utf-8"),
                     (codecs.BOM_UTF16_LE, "utf-16-le"),
                     (codecs.BOM_UTF16_BE, "utf-16-be")):
        if content.startswith(bom):
            return content[len(bom):].decode(enc, "replace")
    head = bytes(content[:2048])
    m = (_re.search(rb'<meta[^>]+charset=["\']?([\w.\-]+)', head, _re.I)
         or _re.search(rb'<\?xml[^>]+encoding=["\']?([\w.\-]+)', head, _re.I))
    for enc in ((m.group(1).decode("ascii", "ignore"),) if m else ()) + \
               ((declared,) if declared else ()):
        try:
            return content.decode(enc)
        except (LookupError, UnicodeDecodeError):
            continue
    return content.decode("utf-8", "replace")


def _resp_content(context, as_text: bool = True):
    """``context['resp'].content`` (the raw bytes body), decoded for our
    str-based engines unless ``as_text`` is False."""
    resp = context["resp"]
    content = resp.content
    if not as_text:
        return content
    return _sniff_decode(content, getattr(resp, "encoding", None))


class InputCallbacks:
    """Named pre-parse decode of the fetched body, selected by
    ``CrawlerRule['input_callback']`` (reference: utils.py:745-803)."""

    _TEXT_CALLBACKS: Dict[str, Callable] = {
        "json": lambda text, context: EngineConfig.json_loads(text),
        "se": lambda text, context: dom.parse_html(text),
        "selectolax": lambda text, context: dom.parse_html(text),
        "css": lambda text, context: dom.parse_html(text),
        "html": lambda text, context: dom.parse_html(text),
        "xml": lambda text, context: dom.parse_xml(text),
    }
    # content-mode twins: ignore the pre-decoded text, re-decode from the
    # raw response bytes (reference: use_content_for_default_callbacks,
    # utils.py:757-773 — fixes bodies whose transport-guessed encoding is
    # wrong but whose bytes declare the real charset)
    _CONTENT_CALLBACKS: Dict[str, Callable] = {
        "json": lambda text, context: EngineConfig.json_loads(
            _resp_content(context, as_text=False)),
        "se": lambda text, context: dom.parse_html(_resp_content(context)),
        "selectolax": lambda text, context: dom.parse_html(_resp_content(context)),
        "css": lambda text, context: dom.parse_html(_resp_content(context)),
        "html": lambda text, context: dom.parse_html(_resp_content(context)),
        "xml": lambda text, context: dom.parse_xml(_resp_content(context)),
    }
    _CALLBACKS: Dict[str, Callable] = dict(_TEXT_CALLBACKS)
    CATCH_EXCEPTIONS = (Exception,)

    @classmethod
    def use_content_for_default_callbacks(cls, **kwargs):
        """Switch the default named callbacks to decode from
        ``resp.content`` bytes; extra ``name=callable`` pairs install
        alongside (reference: utils.py:757-773)."""
        cls._CALLBACKS.update(cls._CONTENT_CALLBACKS, **kwargs)

    @classmethod
    def use_text_for_default_callbacks(cls, **kwargs):
        """Restore the text-mode defaults (inverse of the switch)."""
        cls._CALLBACKS.update(cls._TEXT_CALLBACKS, **kwargs)

    @classmethod
    def callback(cls, text, context, callback_name=None):
        try:
            return cls._CALLBACKS.get(callback_name, cls.default_callback)(text, context)
        except cls.CATCH_EXCEPTIONS:
            return cls.default_callback(text, context)

    @staticmethod
    def default_callback(text, context):
        return text


class RuleVM:
    """Parser collection + rule evaluation
    (reference: Uniparser, parsers.py:1240-1393)."""

    def __init__(self, parse_callback: Callable = None):
        # one instance of each registered parser; user parsers register
        # via BaseParser subclassing (reference: parsers.py:1280-1284)
        self.parsers: Dict[str, BaseParser] = {}
        instances: Dict[type, BaseParser] = {}
        for name, cls in PARSER_REGISTRY.items():
            inst = instances.get(cls)
            if inst is None:
                inst = instances[cls] = cls()
            self.parsers[name] = inst
        self.parse_callback = parse_callback
        self.request_adapter: TransportAdapter = None
        self._DEFAULT_FREQUENCY = NullFrequency()
        self._HOST_FREQUENCIES: Dict[str, Frequency] = {}
        self._HOST_ASYNC_FREQUENCIES: Dict[str, AsyncFrequency] = {}

    def __getattr__(self, name):
        # uni.css / uni.python style access used by conformance tests
        parsers = self.__dict__.get("parsers") or {}
        if name in parsers:
            return parsers[name]
        raise AttributeError(name)

    # -- chain ------------------------------------------------------------
    def parse_chain(self, input_object, chain_rules: List, context: dict = None):
        context = EngineConfig.init_context() if context is None else context
        for parser_name, param, value in chain_rules:
            parser = self.parsers.get(parser_name)
            if parser is None:
                raise UnknownParserNameError(f"Unknown parser name: {parser_name}")
            if parser_name == "context":
                input_object = context
            elif context and parser_name == "udf" and not value:
                value = context
            input_object = parser.parse(input_object, param, value)
        return input_object

    # -- rule tree --------------------------------------------------------
    def parse_parse_rule(self, input_object, rule: ParseRule, context=None):
        context = rule.context if context is None else context
        input_object = self.parse_chain(input_object, rule["chain_rules"],
                                        context=context)
        if rule["name"] == EngineConfig.__schema__ and input_object is not True:
            raise InvalidSchemaError(
                f"Schema check is not True: {repr(input_object)[:50]}")
        if rule["child_rules"]:
            result: Dict[str, Any] = {rule["name"]: {}}
            if rule.get("iter_parse_child", False):
                result[rule["name"]] = [
                    {
                        sub["name"]: self.parse_parse_rule(
                            partial, sub, context=context).get(sub["name"])
                        for sub in rule["child_rules"]
                    }
                    for partial in input_object
                ]
            else:
                for sub in rule["child_rules"]:
                    result[rule["name"]][sub["name"]] = self.parse_parse_rule(
                        input_object, sub, context=context).get(sub["name"])
        else:
            result = {rule["name"]: input_object}
        if self.parse_callback:
            return self.parse_callback(rule, result, context)
        return result

    def parse_crawler_rule(self, input_object, rule: CrawlerRule, context=None):
        parse_result: Dict[str, Any] = {}
        context = rule.context if context is None else context
        context.setdefault("request_args", rule["request_args"])
        context.setdefault("req", context["request_args"])
        context["parse_result"] = parse_result
        _input_object = input_object
        for parse_rule in rule["parse_rules"]:
            temp = self.parse_parse_rule(_input_object, parse_rule,
                                         context).get(parse_rule["name"])
            if parse_rule["name"] == EngineConfig.__object__:
                _input_object = temp
            parse_result[parse_rule["name"]] = temp
        context.pop("parse_result", None)
        return {rule["name"]: parse_result}

    def parse(self, input_object, rule_object: Union[CrawlerRule, ParseRule],
              context=None):
        context = rule_object.context if context is None else context
        if isinstance(rule_object, CrawlerRule):
            input_object = InputCallbacks.callback(
                text=input_object, context=context,
                callback_name=rule_object.get("input_callback"))
            return self.parse_crawler_rule(input_object, rule_object, context)
        if isinstance(rule_object, ParseRule):
            return self.parse_parse_rule(input_object, rule_object, context)
        raise TypeError("rule_object type should be CrawlerRule or ParseRule.")

    # -- download / crawl (single-process form; the distributed form is
    # the Fetcher actor-pool stage) -----------------------------------
    def ensure_adapter(self) -> TransportAdapter:
        if self.request_adapter is None:
            from .transport import RequestsAdapter
            self.request_adapter = RequestsAdapter()
        return self.request_adapter

    def download(self, crawler_rule: CrawlerRule = None, request_adapter=None,
                 **request):
        """Per-host frequency gate around the transport request; non-http
        URLs skip downloading — request_args IS the input_object
        (reference: parsers.py:1497-1517)."""
        request_adapter = request_adapter or self.ensure_adapter()
        if isinstance(crawler_rule, CrawlerRule):
            request_args = crawler_rule.get_request(**request)
        else:
            request_args = request
        host = get_host(request_args["url"])
        if request_args["url"].startswith("http"):
            freq = self._HOST_FREQUENCIES.get(host, self._DEFAULT_FREQUENCY)
            with freq:
                with request_adapter as req:
                    input_object, resp = req.request(**dict(request_args))
        else:
            input_object, resp = request_args, None
        return input_object, resp

    def crawl(self, crawler_rule: CrawlerRule, request_adapter=None,
              context=None, **request):
        """download + context seeding + parse
        (reference: parsers.py:1519-1537)."""
        request_args = crawler_rule.get_request(**request)
        input_object, resp = self.download(None, request_adapter, **request_args)
        if isinstance(resp, Exception):
            return resp
        if context is None:
            context = crawler_rule.context
        else:
            for k, v in crawler_rule.context.items():
                context.setdefault(k, v)
        context["resp"] = resp
        context["request_args"] = request_args
        return self.parse(input_object, crawler_rule, context)

    # -- async twins (reference: parsers.py:1395-1482 aparse chain,
    # crawler.py:191-224 acrawl).  The chain/rule engine is sync — Ray
    # tasks supply the parallelism — so aparse runs the sync
    # implementation on the event loop's thread executor: usable from
    # async apps (won't block the loop), identical results, without
    # duplicating the chain logic.  adownload/acrawl are NATIVELY async
    # when given an AsyncTransportAdapter (aiohttp/httpx/synthetic —
    # awaitable fetch + AsyncFrequency pacing, the reference's
    # AsyncRequestAdapter path, utils.py:258-316); a sync adapter falls
    # back to the thread executor.  Async UDF *results* are awaited
    # inside the chain itself (parsers.UDFParser._maybe_await).

    async def aparse(self, input_object,
                     rule_object: Union[CrawlerRule, ParseRule],
                     context=None):
        import asyncio
        return await asyncio.to_thread(self.parse, input_object,
                                       rule_object, context)

    def _async_frequency(self, host: str) -> "AsyncFrequency | NullFrequency":
        """Async pacing gate mirroring the host's sync Frequency
        settings (separate token window — sync and async callers each
        hold their own clock, like the reference's Frequency /
        AsyncFrequency pair)."""
        freq = self._HOST_FREQUENCIES.get(host)
        if freq is None:
            return _NULL_ASYNC_FREQUENCY
        afreq = self._HOST_ASYNC_FREQUENCIES.get(host)
        if afreq is None or (afreq.n, afreq.interval) != (freq.n,
                                                          freq.interval):
            afreq = AsyncFrequency(freq.n, freq.interval)
            self._HOST_ASYNC_FREQUENCIES[host] = afreq
        return afreq

    async def adownload(self, crawler_rule: CrawlerRule = None,
                        request_adapter=None, **request):
        import asyncio
        request_adapter = request_adapter or self.request_adapter
        if isinstance(request_adapter, AsyncTransportAdapter):
            if isinstance(crawler_rule, CrawlerRule):
                request_args = crawler_rule.get_request(**request)
            else:
                request_args = request
            host = get_host(request_args["url"])
            if request_args["url"].startswith("http"):
                async with self._async_frequency(host):
                    async with request_adapter as req:
                        return await req.request(**dict(request_args))
            return request_args, None
        return await asyncio.to_thread(
            lambda: self.download(crawler_rule, request_adapter, **request))

    async def acrawl(self, crawler_rule: CrawlerRule, request_adapter=None,
                     context=None, **request):
        import asyncio
        request_adapter = request_adapter or self.request_adapter
        if isinstance(request_adapter, AsyncTransportAdapter):
            request_args = crawler_rule.get_request(**request)
            input_object, resp = await self.adownload(None, request_adapter,
                                                      **request_args)
            if isinstance(resp, Exception):
                return resp
            if context is None:
                context = crawler_rule.context
            else:
                for k, v in crawler_rule.context.items():
                    context.setdefault(k, v)
            context["resp"] = resp
            context["request_args"] = request_args
            return await self.aparse(input_object, crawler_rule, context)
        return await asyncio.to_thread(
            lambda: self.crawl(crawler_rule, request_adapter, context,
                               **request))

    def set_frequency(self, host_or_url: str, n=0, interval=0):
        host = get_host(host_or_url, host_or_url)
        self._HOST_FREQUENCIES[host] = Frequency(n, interval)

    def pop_frequency(self, host_or_url: str, default=None):
        host = get_host(host_or_url, host_or_url)
        self._HOST_ASYNC_FREQUENCIES.pop(host, None)
        return self._HOST_FREQUENCIES.pop(host, default)


# API-compatible alias so reference-shaped code reads naturally
Uniparser = RuleVM
