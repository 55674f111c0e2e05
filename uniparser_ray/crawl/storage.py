"""Rule-pack storage: {host: HostRule} registries.

``RulePackSource`` is the engine's rule-storage interface
(reference: crawler.py:20-44); ``JSONRuleStorage`` is the JSON-file
implementation (reference: crawler.py:47-127).  In the Ray engine a
rule pack is loaded once on the driver, compiled, and broadcast via
``ray.put`` to every rule-match / parse task.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional

from ..config import EngineConfig
from ..rulevm.request import get_host
from ..rulevm.rules import CrawlerRule, HostRule, JsonSerializable


class RulePackSource(ABC):
    @abstractmethod
    def commit(self):
        ...

    @abstractmethod
    def find_crawler_rule(self, url, method="find") -> Optional[CrawlerRule]:
        ...

    @abstractmethod
    def add_crawler_rule(self, rule: CrawlerRule, commit=False):
        ...

    @abstractmethod
    def pop_crawler_rule(self, rule: CrawlerRule, commit=False):
        ...

    @abstractmethod
    def add_host_rule(self, rule: HostRule, commit=False):
        ...

    @abstractmethod
    def pop_host_rule(self, host: str, commit=False):
        ...


class JSONRuleStorage(JsonSerializable, RulePackSource):
    """{host: HostRule} persisted to a JSON file (or in-memory when
    ``file_path=None``)."""

    def __init__(self, file_path=None, **kwargs):
        super().__init__()
        self.__dict__["file_path"] = Path(file_path) if file_path else None
        if self.file_path and self.file_path.is_file():
            text = self.file_path.read_text()
            if text:
                for host, host_rule in EngineConfig.json_loads(text).items():
                    self[host] = HostRule(**host_rule)
        for host, host_rule in kwargs.items():
            self[host] = HostRule(**host_rule)
        self.commit()

    def commit(self):
        if self.file_path:
            self.file_path.write_text(json.dumps(self))

    def find_crawler_rule(self, url, method="find"):
        host_rule = self.get(get_host(url))
        if not host_rule:
            return None
        return getattr(host_rule, method)(url)

    def add_crawler_rule(self, rule: CrawlerRule, commit=False):
        url = rule.get("request_args", {}).get("url")
        host = get_host(url)
        if not host:
            return False
        host_rule = self.setdefault(host, HostRule(host))
        host_rule.add_crawler_rule(rule)
        if commit:
            self.commit()
        return True

    def pop_crawler_rule(self, rule: CrawlerRule, commit=False):
        host = get_host(rule["request_args"].get("url"))
        host_rules = [self.get(host)] if host else list(self.values())
        for host_rule in host_rules:
            if host_rule:
                crawler_rule = host_rule.pop_crawler_rule(rule["name"])
                if commit:
                    self.commit()
                return crawler_rule
        return None

    def add_host_rule(self, rule: HostRule, commit=False):
        self[rule["host"]] = rule
        if commit:
            self.commit()

    def pop_host_rule(self, host: str, commit=False):
        rule = self.pop(host, None)
        if commit:
            self.commit()
        return rule


# JsonSerializable.__slots__ is () but RulePackSource has no slots, so
# instances get a __dict__ — file_path lives there.


def read_seed_list(path: str, url_column: str = "url") -> list:
    """Seed-list reader: ``.txt`` (one URL per line, '#' comments) or
    ``.parquet`` (a ``url`` column).  Driver-side by design — seed
    lists are the one crawl input that is naturally small relative to
    the frontier they grow into; a parquet DIRECTORY of seeds can also
    be passed straight to CrawlConfig via the round-0 checkpoint
    instead."""
    from pathlib import Path

    p = Path(path)
    if p.suffix == ".parquet" or p.is_dir():
        import pyarrow.parquet as pq
        t = pq.read_table(str(p), columns=[url_column])
        return [u for u in t[url_column].to_pylist() if u]
    urls = []
    for line in p.read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            urls.append(line)
    return urls
