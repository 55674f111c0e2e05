"""CLI entry point: ``python -m uniparser_ray <subcommand>``.

The reference ships an interactive rule-test console as a web server
(reference: uniparser/webui.py:48-134, __main__.py:6-19); here the
same "try one rule against one page" loop is a driver-side CLI, plus
job-shaped subcommands that become the ``ray job submit`` payload on a
real cluster.

Subcommands
-----------
test-rule   parse one input file with one rule JSON, print the result
curl-parse  curl command string -> request_args JSON (webui /curl_parse)
crawl       run the distributed crawl from a JSON config (resumable)
gen-images  materialize the synthetic input_hint image+caption table
bench       alias for the repo-root bench suite

Only the subcommands that need Ray (crawl, gen-images, bench) touch
``ray.init`` — and only via the guarded helper below, so the module
stays import-safe under a driver-owned Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _ensure_ray(num_cpus=None):
    import ray
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True)
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _jsonable(obj):
    if isinstance(obj, BaseException):
        return {"error_type": type(obj).__name__, "error": str(obj)}
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, bytes):
        import base64
        return base64.b64encode(obj).decode()
    return obj


def cmd_test_rule(args) -> int:
    from .rulevm.rules import CrawlerRule, ParseRule
    from .rulevm.vm import RuleVM

    rule_dict = json.loads(Path(args.rule).read_text())
    input_object = Path(args.input).read_text()
    is_crawler = "request_args" in rule_dict or args.crawler
    rule = (CrawlerRule(**rule_dict) if is_crawler
            else ParseRule(**rule_dict))
    context = json.loads(args.context) if args.context else {}
    result = RuleVM().parse(input_object, rule, context=context)
    print(json.dumps(_jsonable(result), indent=2, default=repr))
    return 0


def cmd_curl_parse(args) -> int:
    from .rulevm.request import curlparse
    print(json.dumps(_jsonable(curlparse(args.curl)), indent=2))
    return 0


def cmd_crawl(args) -> int:
    from .crawl.loop import CrawlConfig, run_crawl
    from .sources.synthweb import SynthWeb

    cfg_dict = json.loads(Path(args.config).read_text())
    rule_pack = cfg_dict.pop("rule_pack", None)
    seeds_path = getattr(args, "seeds", None) or cfg_dict.pop("seeds_path",
                                                              None)
    cfg = CrawlConfig(**cfg_dict)
    if seeds_path:
        from .crawl.storage import read_seed_list
        cfg.seeds = (cfg.seeds or []) + read_seed_list(seeds_path)
    if rule_pack is None:
        rule_pack = SynthWeb(**cfg.web_config).rule_pack()
    _ensure_ray(args.num_cpus)
    totals = run_crawl(cfg, rule_pack, resume=not args.no_resume)
    print(json.dumps({k: v for k, v in totals.items() if k != "per_round"}))
    return 0


def cmd_gen_images(args) -> int:
    from .sources.images import generate_images_lance
    _ensure_ray(args.num_cpus)
    generate_images_lance(args.out, args.rows,
                          rows_per_fragment=args.rows_per_fragment)
    print(json.dumps({"out": args.out, "rows": args.rows}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m uniparser_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("test-rule", help="run one rule against one input")
    t.add_argument("--rule", required=True, help="rule JSON file")
    t.add_argument("--input", required=True, help="input document file")
    t.add_argument("--context", help="context dict as JSON string")
    t.add_argument("--crawler", action="store_true",
                   help="force CrawlerRule interpretation")
    t.set_defaults(fn=cmd_test_rule)

    c = sub.add_parser("curl-parse", help="curl command -> request_args")
    c.add_argument("curl", help="the curl command string")
    c.set_defaults(fn=cmd_curl_parse)

    r = sub.add_parser("crawl", help="run the distributed crawl")
    r.add_argument("--config", required=True,
                   help="CrawlConfig fields as JSON (+ optional rule_pack)")
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--seeds", default=None,
                   help="seed list file (.txt one-per-line or .parquet "
                        "with a url column); appended to config seeds")
    r.set_defaults(fn=cmd_crawl)

    g = sub.add_parser("gen-images", help="generate the image+caption table")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=1000)
    g.add_argument("--rows-per-fragment", type=int, default=2000)
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gen_images)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
