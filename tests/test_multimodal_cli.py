"""Multimodal (audio/video) stage plumbing + the CLI console.

The codec stubs decode the synthetic pcm16/rawrgb formats for real;
the tests pin the Ray-side contract (schema, explode layout, strict
mode) so a real codec can be swapped in without touching anything
else.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

from uniparser_ray.stages.multimodal import (AudioFeatureStage,
                                             VideoFrameSampleStage,
                                             audio_features,
                                             synth_audio_table,
                                             synth_video_table,
                                             video_frame_samples)

REPO = Path(__file__).resolve().parent.parent


def test_audio_features_dataset(ray_session):
    import ray.data as rd
    t = synth_audio_table(12)
    out = audio_features(rd.from_arrow(t), concurrency=2) \
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert list(out.columns) == ["clip_id", "duration_s", "rms", "zcr",
                                 "peak"]
    assert len(out) == 12
    # sine-dominated clips: RMS near 0.5/sqrt(2), bounded peak
    assert (out["rms"] > 0.2).all() and (out["peak"] <= 1.0).all()
    # deterministic across runs
    again = audio_features(rd.from_arrow(t), concurrency=2) \
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert out.equals(again)


def test_audio_strict_raises():
    stage = AudioFeatureStage(strict=True)
    bad = pa.Table.from_pylist([{
        "clip_id": "x", "bytes": b"\x00" * 64, "sample_rate": 8000,
        "n_samples": 32, "fmt": "mp3"}])
    with pytest.raises(NotImplementedError):
        stage(bad)


def test_video_frame_sampling(ray_session):
    import ray.data as rd
    t = synth_video_table(5)
    out = video_frame_samples(rd.from_arrow(t), k=3, concurrency=2) \
        .to_pandas().sort_values(["video_id", "frame_index"]) \
        .reset_index(drop=True)
    assert list(out.columns) == ["video_id", "frame_index", "frame_ppm",
                                 "t_seconds"]
    assert len(out) == 5 * 3
    # sampled frame decodes back to the source frame exactly
    from uniparser_ray.sources.codecs import decode_image
    row0 = t.to_pylist()[0]
    frames = np.frombuffer(row0["bytes"], np.uint8).reshape(
        row0["n_frames"], row0["h"], row0["w"], 3)
    first = out[out["video_id"] == row0["video_id"]].iloc[0]
    px = decode_image(first["frame_ppm"], "ppm")
    assert np.array_equal(px, frames[int(first["frame_index"])])


def test_video_strict_raises():
    stage = VideoFrameSampleStage(strict=True)
    bad = pa.Table.from_pylist([{
        "video_id": "x", "bytes": b"\x00" * 100, "n_frames": 2, "w": 4,
        "h": 4, "fps": 8.0, "fmt": "h264"}])
    with pytest.raises(NotImplementedError):
        stage(bad)


def test_cli_test_rule(tmp_path):
    rule = {"name": "title",
            "chain_rules": [["css", "a.url", "@href"],
                            ["python", "getitem", "[0]"]],
            "child_rules": []}
    (tmp_path / "rule.json").write_text(json.dumps(rule))
    (tmp_path / "page.html").write_text('<a class="url" href="/x">t</a>')
    out = subprocess.run(
        [sys.executable, "-m", "uniparser_ray", "test-rule",
         "--rule", str(tmp_path / "rule.json"),
         "--input", str(tmp_path / "page.html")],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    assert json.loads(out) == {"title": "/x"}


def test_cli_crawl_seeds_file(ray_session, tmp_path, capsys):
    """--seeds PATH populates CrawlConfig.seeds via read_seed_list —
    the seed-list reader is reachable from the public CLI surface."""
    from uniparser_ray.__main__ import main
    from uniparser_ray.sources.synthweb import SynthWeb

    web_cfg = dict(num_hosts=2, base_pages=4, fanout=2, hot_factor=2.0)
    web = SynthWeb(**web_cfg)
    cfg = {"web_config": web_cfg, "out_dir": str(tmp_path / "out"),
           "max_rounds": 2, "per_host_budget": 2, "fetch_concurrency": 2,
           "seen_shard_bits": 1}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    (tmp_path / "seeds.txt").write_text(
        "# comment\n" + "\n".join(web.seed_urls()) + "\n")
    rc = main(["crawl", "--config", str(tmp_path / "cfg.json"),
               "--seeds", str(tmp_path / "seeds.txt")])
    assert rc == 0
    totals = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert totals["granted"] > 0


def test_cli_console_session(tmp_path):
    """The interactive rule console (reference webui's download-once /
    parse-many loop): one loaded document, iterated chains + a rule
    file, without refetching."""
    (tmp_path / "page.html").write_text(
        '<html><title>T</title><a class="u" href="/x">L</a>'
        "<p>v=42</p></html>")
    rule = {"name": "title",
            "chain_rules": [["css", "title", "$text"],
                            ["python", "getitem", "[0]"]],
            "child_rules": []}
    (tmp_path / "rule.json").write_text(json.dumps(rule))
    script = "\n".join([
        f"load {tmp_path / 'page.html'}",
        "chain re v=(\\d+) $1",
        "parse",
        "clear",
        f"rule {tmp_path / 'rule.json'}",
        "parse",
        "show",
        "quit",
    ])
    (tmp_path / "script.txt").write_text(script)
    out = subprocess.run(
        [sys.executable, "-m", "uniparser_ray", "console",
         "--script", str(tmp_path / "script.txt")],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert lines[0]["chars"] > 0
    assert lines[2] == {"console": ["42"]}        # quick chain parse
    assert lines[4] == {"rule": "title"}
    assert lines[5] == {"title": "T"}             # rule parse, same input
    assert lines[6]["rule"] == "title"


def test_cli_curl_parse():
    out = subprocess.run(
        [sys.executable, "-m", "uniparser_ray", "curl-parse",
         'curl -X POST -d "a=1" -H "X-K: v" http://example.com/p'],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    args = json.loads(out)
    assert args["url"] == "http://example.com/p"
    assert args["method"] == "post"
    assert args["headers"]["X-K"] == "v"


def test_http_console_endpoints():
    """The HTTP rule console (reference webui.py:72-134): /request
    downloads once and stashes the sticky context, /parse iterates
    against it, /curl_parse converts curl commands, GET / lists the
    parser registry."""
    import threading
    import urllib.request

    from uniparser_ray.rulevm.transport import SyntheticWebAdapter
    from uniparser_ray.webconsole import make_server

    class DictWeb:
        def get(self, url):
            body = ('<html><title>T</title><p id="v">v=42</p></html>'
                    .encode("utf-8"))
            return 200, {"Content-Type": "text/html"}, body

    server = make_server(port=0, request_adapter=SyntheticWebAdapter(DictWeb()))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def call(path, data=None, raw=False):
        url = f"http://127.0.0.1:{port}{path}"
        if data is None:
            req = urllib.request.Request(url)
        else:
            body = data if raw else json.dumps(data).encode()
            req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.loads(resp.read().decode())

    try:
        index = call("/")
        assert "css" in index["parsers"] and "json" in index["cb_names"]

        rule = {"name": "page",
                "request_args": {"url": "http://synth.test/a",
                                 "method": "get"},
                "parse_rules": [
                    {"name": "num",
                     "chain_rules": [["re", r"v=(\d+)", "$1"],
                                     ["python", "getitem", "[0]"]],
                     "child_rules": []}],
                "regex": "https?://synth.test/.*"}
        got = call("/request", rule)
        assert got["ok"] and got["msg"] == "" and "v=42" in got["text"]

        # parse many against the sticky downloaded context
        parsed = call("/parse", {"input_object": got["text"],
                                 "rule": json.dumps(rule)})
        assert json.loads(parsed["json"]) == {"page": {"num": "42"}}

        # regex mismatch is reported but download still succeeds
        bad = dict(rule, regex="https?://other.example/.*")
        got2 = call("/request", bad)
        assert got2["ok"] and "does not match" in got2["msg"]

        curl = call("/curl_parse",
                    b'curl -H "X-K: v" http://example.com/p', raw=True)
        assert curl["ok"] and curl["result"]["url"] == "http://example.com/p"

        # unknown path -> 404 JSON error
        import urllib.error
        try:
            call("/nope", {})
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_video_shot_boundaries(ray_session):
    """Detected shots equal the generator's shot structure for every
    clip; exactly one keyframe per shot; SAD separates intra-shot
    (<=512) from cross-shot (>5000)."""
    import numpy as np

    from uniparser_ray.pipelines.images_q import video_shot_boundaries
    from uniparser_ray.stages.multimodal import _synth_shot_frames

    out = video_shot_boundaries("/root/testdata/sf0.001").to_pandas() \
        .sort_values(["video_id", "frame_index"])
    for vid, g in out.groupby("video_id"):
        i = int(vid.split("-")[1])
        _, shot_lens = _synth_shot_frames(i)
        # structural equality: shot_id runs have the generator lengths
        runs = g.groupby("shot_id").size().tolist()
        assert runs == shot_lens, (vid, runs, shot_lens)
        # one keyframe per shot, and it is the shot's first frame
        keys = g[g["is_keyframe"] == 1]
        assert len(keys) == len(shot_lens)
        assert keys.groupby("shot_id")["frame_index"].min().tolist() \
            == keys["frame_index"].tolist()
        # crisp SAD separation
        intra = g[(g["is_boundary"] == 0) & (g["frame_index"] > 0)]["sad"]
        cross = g[g["is_boundary"] == 1]["sad"]
        assert (intra <= 512).all()
        assert (cross > 5000).all()


def test_video_shot_stage_nonraw_stub_strict():
    """Non-rawrgb clips raise in strict mode (declared stub), like the
    frame sampler."""
    import pyarrow as pa
    import pytest as _pytest

    from uniparser_ray.stages.multimodal import VideoShotStage

    batch = pa.table({"video_id": ["x"], "bytes": [b"\x00" * 64],
                      "n_frames": [2], "w": [2], "h": [2],
                      "fps": [8.0], "fmt": ["h264"]})
    with _pytest.raises(NotImplementedError):
        VideoShotStage(strict=True)(batch)
    # non-strict: deterministic fake frames still produce valid rows
    out = VideoShotStage(strict=False)(batch)
    assert out.num_rows == 2


def test_audio_vad_segments(ray_session):
    """Detected segments equal the generator plan per clip; active
    windows dominate energy by construction; non-pcm16 strict raises."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from uniparser_ray.pipelines.images_q import audio_vad_segments
    from uniparser_ray.stages.multimodal import (AudioVadStage,
                                                 VAD_THRESHOLD, VAD_WINDOW,
                                                 _synth_segmented_pcm)

    out = audio_vad_segments("/root/testdata/sf0.001").to_pandas() \
        .sort_values(["clip_id", "seg_index"])
    for cid, g in out.groupby("clip_id"):
        i = int(cid.split("-")[1])
        _, plan = _synth_segmented_pcm(i)
        assert list(zip(g["n_windows"], g["active"])) \
            == [(n, a) for n, a in plan]
        # segments tile the clip contiguously
        assert g["start_win"].tolist() \
            == np.concatenate([[0], g["n_windows"].cumsum()[:-1]]).tolist()
        act = g[g["active"] == 1]
        sil = g[g["active"] == 0]
        if len(act) and len(sil):
            assert act["energy_sum"].min() > VAD_THRESHOLD * \
                act["n_windows"].min()
            assert (sil["energy_sum"]
                    <= VAD_THRESHOLD * sil["n_windows"]).all()

    batch = pa.table({"clip_id": ["x"], "bytes": [b"\x00" * 640],
                      "sample_rate": [8000], "n_samples": [320],
                      "fmt": ["mp3"]})
    with _pytest.raises(NotImplementedError):
        AudioVadStage(strict=True)(batch)
    assert AudioVadStage(strict=False)(batch).num_rows >= 1


def test_http_console_html_page():
    """Browser workflow (reference webui.py:101-134 serves an HTML
    form): GET / with Accept: text/html returns the self-contained
    page wired to the same endpoints; the JSON registry stays the
    default for API clients; the page's fetch targets actually work
    (drive /request then /parse exactly as the inline JS does)."""
    import threading
    import urllib.request

    from uniparser_ray.rulevm.transport import SyntheticWebAdapter
    from uniparser_ray.webconsole import make_server

    class DictWeb:
        def get(self, url):
            return 200, {}, b"<html><title>H</title><p>v=7</p></html>"

    server = make_server(port=0,
                         request_adapter=SyntheticWebAdapter(DictWeb()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def get(path, accept=None):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
        if accept:
            req.add_header("Accept", accept)
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.headers.get("Content-Type", ""), resp.read().decode()

    def post(path, data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(data).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.loads(resp.read().decode())

    try:
        ctype, page = get("/", accept="text/html,application/xhtml+xml")
        assert ctype.startswith("text/html")
        for target in ("/request", "/parse", "/curl_parse", "css"):
            assert target in page
        # API clients still get the JSON registry
        ctype2, body = get("/")
        assert ctype2.startswith("application/json")
        assert "css" in json.loads(body)["parsers"]
        # the page's download-once / parse-many loop end-to-end
        rule = {"name": "page",
                "request_args": {"url": "http://synth.test/x",
                                 "method": "get"},
                "parse_rules": [
                    {"name": "num",
                     "chain_rules": [["re", r"v=(\d+)", "$1"],
                                     ["python", "getitem", "[0]"]],
                     "child_rules": []}],
                "regex": "https?://synth.test/.*"}
        got = post("/request", rule)
        assert got["ok"] and "v=7" in got["text"]
        parsed = post("/parse", {"input_object": got["text"],
                                 "rule": json.dumps(rule)})
        assert json.loads(parsed["json"]) == {"page": {"num": "7"}}

        # round-5 editor payloads: the structured parse-rule editor /
        # input-callback dropdown / per-parser doc panel need the
        # registry embedded as VALID JS data — parse it back out and
        # pin the page's editor hooks exist and every %TOKEN% was
        # substituted
        import re as _re
        assert "%REGISTRY%" not in page and "%PARSERS_JSON%" not in page
        parsers = json.loads(_re.search(
            r"const PARSERS = (\[.*?\]);", page, _re.S).group(1))
        docs = json.loads(_re.search(
            r"const DOCS = (\{.*?\});\nconst CALLBACKS", page,
            _re.S).group(1))
        cbs = json.loads(_re.search(
            r"const CALLBACKS = (\[.*?\]);", page, _re.S).group(1))
        assert "css" in parsers and "re" in parsers
        assert docs["css"] and isinstance(cbs, list) and cbs
        for hook in ("addStep", "insertField", "setCallback", "showDoc"):
            assert hook in page
    finally:
        server.shutdown()
        server.server_close()
