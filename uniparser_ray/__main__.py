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


def cmd_console(args) -> int:
    """Interactive rule console — the reference Web UI's
    download-once / parse-many loop (reference: webui.py:72-134,
    fastapi_ui/views.py:53-135) as a line REPL.  One input document is
    loaded or downloaded ONCE, then rules/chains iterate against it
    without refetching:

        load <path>            read the input document from a file
        download <url>         fetch the input document (once)
        rule <path>            load a Parse/CrawlerRule JSON file
        chain <parser> <param> [value]   append a quick chain step
        clear                  drop the quick chain + loaded rule
        parse                  run rule/chain against the input
        show                   current state summary
        quit
    """
    import sys as _sys

    from .rulevm.rules import CrawlerRule, ParseRule
    from .rulevm.vm import RuleVM

    vm = RuleVM()
    state = {"input": None, "rule": None, "chain": []}
    out = _sys.stdout
    stream = open(args.script) if getattr(args, "script", None) else _sys.stdin

    def emit(obj):
        print(json.dumps(_jsonable(obj), default=repr), file=out, flush=True)

    for raw in stream:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        # plain whitespace split — NO shell-style escape processing, so
        # regex params like v=(\d+) pass through verbatim; the trailing
        # piece (a path or a chain value) may contain spaces
        head = line.split(None, 1)
        cmd = head[0]
        tail = head[1] if len(head) > 1 else ""
        rest = tail.split(None, 2) if cmd == "chain" else ([tail] if tail
                                                           else [])
        if cmd in ("quit", "exit"):
            break
        try:
            if cmd == "load":
                state["input"] = Path(rest[0]).read_text()
                emit({"loaded": rest[0], "chars": len(state["input"])})
            elif cmd == "download":
                text, resp = vm.download(url=rest[0], method="get")
                if isinstance(resp, Exception):
                    emit({"error_type": type(resp).__name__,
                          "error": str(resp)})
                else:
                    state["input"] = text
                    emit({"downloaded": rest[0],
                          "status": getattr(resp, "status_code", None),
                          "chars": len(text or "")})
            elif cmd == "rule":
                rd = json.loads(Path(rest[0]).read_text())
                state["rule"] = (CrawlerRule(**rd) if "request_args" in rd
                                 else ParseRule(**rd))
                emit({"rule": state["rule"]["name"]})
            elif cmd == "chain":
                step = [rest[0], rest[1], rest[2] if len(rest) > 2 else ""]
                state["chain"].append(step)
                emit({"chain": state["chain"]})
            elif cmd == "clear":
                state["rule"] = None
                state["chain"] = []
                emit({"cleared": True})
            elif cmd == "parse":
                if state["input"] is None:
                    emit({"error": "no input: use load/download first"})
                    continue
                rule = state["rule"]
                if rule is None:
                    rule = ParseRule(name="console",
                                     chain_rules=state["chain"],
                                     child_rules=[])
                emit(vm.parse(state["input"], rule, context={}))
            elif cmd == "show":
                emit({"input_chars": (len(state["input"])
                                      if state["input"] else None),
                      "rule": state["rule"]["name"] if state["rule"]
                      else None,
                      "chain": state["chain"]})
            else:
                emit({"error": f"unknown command {cmd!r}"})
        except Exception as e:
            emit({"error_type": type(e).__name__, "error": str(e)})
    return 0


def cmd_serve(args) -> int:
    """HTTP rule console (reference: webui.py) — /request, /parse,
    /curl_parse over stdlib http.server."""
    from .webconsole import serve
    print(f"uniparser-ray console on http://{args.host}:{args.port}",
          file=sys.stderr, flush=True)
    serve(host=args.host, port=args.port)
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

    c = sub.add_parser("console", help="interactive rule console "
                                       "(download once, parse many)")
    c.add_argument("--script", default=None,
                   help="read commands from a file instead of stdin")
    c.set_defaults(fn=cmd_console)

    s = sub.add_parser("serve", help="HTTP rule console "
                                     "(/request /parse /curl_parse)")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.set_defaults(fn=cmd_serve)

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
