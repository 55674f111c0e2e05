"""Single-process recursive crawler — the conformance ORACLE.

Reproduces the reference's recursive ``__request__`` / ``__result__``
crawl loop exactly (reference: crawler.py:129-224) in one process with
deterministic sequential fan-out.  The distributed round-based engine
(uniparser_ray.crawl.loop) must produce the same URL-seen set, crawl
tree and parsed values as this oracle on the same seeds + rule pack;
tests assert that equivalence.
"""

from __future__ import annotations

from typing import Optional

from ..config import EngineConfig
from ..exceptions import RuleNotFoundError
from ..rulevm.request import ensure_request
from ..rulevm.vm import RuleVM
from .storage import RulePackSource


class OracleCrawler:
    """Sequential version of the reference Crawler: child requests are
    crawled depth-first in extraction order (the reference's
    ThreadPoolExecutor fan-out preserves result order too — task list
    order, crawler.py:177-184 — so results are identical)."""

    def __init__(self, vm: RuleVM = None, storage: RulePackSource = None,
                 max_depth: int = 50):
        self.vm = vm or RuleVM()
        self.storage = storage
        self.max_depth = max_depth

    def crawl(self, request, context=None, _depth: int = 0):
        if not request:
            return None
        if _depth > self.max_depth:
            return RuntimeError(f"max crawl depth {self.max_depth} exceeded")
        request_args = ensure_request(request)
        url = request_args["url"]
        crawler_rule = self.storage.find_crawler_rule(url)
        if not crawler_rule:
            return RuleNotFoundError(f"No rule matched the given url: {url}")
        result = self.vm.crawl(crawler_rule, context=context, **request_args)
        if isinstance(result, BaseException):
            return result
        child = result[crawler_rule["name"]].get(EngineConfig.__request__)
        if child:
            if isinstance(child, (list, tuple)):
                result[crawler_rule["name"]][EngineConfig.__result__] = [
                    self.crawl(req, context=context, _depth=_depth + 1) if req else None
                    for req in child
                ]
            else:
                result[crawler_rule["name"]][EngineConfig.__result__] = self.crawl(
                    child, context=context, _depth=_depth + 1)
        return result


# reference-shaped alias
Crawler = OracleCrawler
