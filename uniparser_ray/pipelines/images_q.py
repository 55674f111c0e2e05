"""Image/multimodal pipelines over the input_hint image+caption table.

The testdata directories carry no image table, so each sf gets a
deterministic synthetic one (sources.images — same generator the
synthetic web serves bytes from) materialized once under /tmp as a
Lance-layout table.  All checks for these queries are rows-only
(binary columns aren't SQL-oracle-able), but every pipeline is
deterministic so cross-round hashes are stable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.codecs import average_hash64, decode_image
from ..sources.images import generate_images_lance
from ..storage.lance_layout import LanceLayoutTable

_ROWS_BY_SF = {"sf0.001": 300, "sf0.01": 1000, "sf0.1": 4000}


def images_lance_for(sf_dir: str) -> LanceLayoutTable:
    tag = Path(sf_dir).name or "sf0.01"
    n = _ROWS_BY_SF.get(tag, 1000)
    root = f"/tmp/uniparser_ray_cache/images_{tag}"
    table = LanceLayoutTable(root)
    if table.count_rows() < n:
        generate_images_lance(root, n, rows_per_fragment=2000)
    return table


class DecodeStatsStage:
    """Actor-pool decode stage: pure-stdlib codecs in __init__-free
    form (the decode table itself is the per-actor state when real
    codec libs are swapped in)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, phash_ok, wh_ok = [], [], [], []
        for row in batch.to_pylist():
            px = decode_image(row["bytes"], row["fmt"])
            ids.append(row["image_id"])
            means.append(round(float(px.mean()), 4))
            phash_ok.append(average_hash64(px) == row["phash"])
            wh_ok.append(px.shape[0] == row["h"] and px.shape[1] == row["w"])
        return pa.Table.from_arrays([
            pa.array(ids, pa.string()), pa.array(means, pa.float64()),
            pa.array(phash_ok, pa.bool_()), pa.array(wh_ok, pa.bool_())],
            names=["image_id", "mean_pixel", "phash_ok", "wh_ok"])


def images_decode_stats(sf_dir: str):
    table = images_lance_for(sf_dir)
    from ..stages.taskcache import cached_stage
    ds = table.read_dataset()
    return ds.map_batches(cached_stage(DecodeStatsStage),
                          batch_format="pyarrow", batch_size=256)


def images_neardup_phash(sf_dir: str, max_hamming: int = 8):
    """Near-dup images by phash Hamming distance: bucket by 16-bit
    phash blocks (pigeonhole over 4 blocks), verify inside buckets —
    the image twin of simhash dedup."""
    from ..stages.dedup import hamming_block_pairs

    table = images_lance_for(sf_dir)
    ds = table.read_dataset(columns=["image_id", "phash"])
    out = hamming_block_pairs(ds, "image_id", "phash", max_hamming,
                              out_prefix="image")
    df = out.to_pandas().sort_values(["image_a", "image_b"])
    df["hamming"] = df["hamming"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


class ThumbnailStage:
    """Multimodal transform: decode -> 8x8 block-mean thumbnail ->
    re-encode (PPM).  The decode/encode here is the stdlib codec; a
    real deployment swaps the codec table in __init__ for PIL/ffmpeg —
    the Ray-side plumbing (actor pool, small batches, binary columns)
    is identical."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.codecs import encode_ppm
        ids, blobs = [], []
        for row in batch.to_pylist():
            px = decode_image(row["bytes"], row["fmt"])
            h, w, _ = px.shape
            ys = np.linspace(0, h, 9, dtype=int)
            xs = np.linspace(0, w, 9, dtype=int)
            thumb = np.zeros((8, 8, 3), np.uint8)
            for i in range(8):
                for j in range(8):
                    thumb[i, j] = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                                     xs[j]:max(xs[j + 1], xs[j] + 1)].mean(
                        axis=(0, 1))
            ids.append(row["image_id"])
            blobs.append(encode_ppm(thumb))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(blobs, pa.binary())],
            names=["image_id", "thumbnail"])


def images_thumbnails(sf_dir: str):
    table = images_lance_for(sf_dir)
    from ..stages.taskcache import cached_stage
    return table.read_dataset().map_batches(
        cached_stage(ThumbnailStage), batch_format="pyarrow",
        batch_size=256)


def caption_token_stats(sf_dir: str):
    """Text ops over the multimodal table's caption column."""
    table = images_lance_for(sf_dir)
    ds = table.read_dataset(columns=["image_id", "caption"])

    def stats(t: pa.Table) -> pa.Table:
        caps = t["caption"].to_pylist()
        return pa.Table.from_arrays([
            t["image_id"],
            pa.array([len(c.split()) for c in caps], pa.int64()),
            pa.array([len(c) for c in caps], pa.int64())],
            names=["image_id", "n_tokens", "n_chars"])

    return ds.map_batches(stats, batch_format="pyarrow")


_CRAWL_BY_SF = {"sf0.001": dict(num_hosts=3, base_pages=8, fanout=2,
                                hot_factor=3.0),
                "sf0.01": dict(num_hosts=6, base_pages=12, fanout=3,
                               hot_factor=5.0),
                "sf0.1": dict(num_hosts=16, base_pages=40, fanout=3,
                              hot_factor=10.0)}


def crawl_images(sf_dir: str):
    """The flagship: full distributed crawl over the sf-scaled
    synthetic web; returns the input_hint-shaped image+caption table.
    Deterministic (virtual-clock politeness), so rows-only hashes are
    stable across runs."""
    import shutil

    from ..crawl.loop import CrawlConfig, run_crawl
    from ..sources.synthweb import SynthWeb

    tag = Path(sf_dir).name or "sf0.01"
    web_cfg = _CRAWL_BY_SF.get(tag, _CRAWL_BY_SF["sf0.01"])
    web = SynthWeb(**web_cfg)
    out = f"/tmp/uniparser_ray_cache/crawl_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(web_config=web_cfg, out_dir=out, seeds=web.seed_urls(),
                      max_rounds=40, per_host_budget=6, fetch_concurrency=4,
                      seen_shard_bits=3)
    run_crawl(cfg, web.rule_pack())
    table = LanceLayoutTable(f"{out}/images_lance")
    t = table.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                                "caption", "phash"])
    return t.sort_by("image_id")


_AUDIO_BY_SF = {"sf0.001": 60, "sf0.01": 200, "sf0.1": 600}
_VIDEO_BY_SF = {"sf0.001": 20, "sf0.01": 60, "sf0.1": 150}


def audio_features_q(sf_dir: str):
    """Audio multimodal path: deterministic pcm16 clips -> actor-pool
    decode -> per-clip features (duration/rms/zcr/peak)."""
    import ray.data as rd
    from ..stages.multimodal import audio_features, synth_audio_table

    tag = Path(sf_dir).name or "sf0.01"
    t = synth_audio_table(_AUDIO_BY_SF.get(tag, 200))
    out = audio_features(rd.from_arrow(t), concurrency=2).to_pandas()
    return pa.Table.from_pandas(out.sort_values("clip_id"),
                                preserve_index=False)


def video_frames_q(sf_dir: str):
    """Video multimodal path: rawrgb clips -> frame sampling (k=3) ->
    one row per sampled frame with the frame re-encoded as PPM."""
    import ray.data as rd
    from ..stages.multimodal import synth_video_table, video_frame_samples

    tag = Path(sf_dir).name or "sf0.01"
    t = synth_video_table(_VIDEO_BY_SF.get(tag, 60))
    out = video_frame_samples(rd.from_arrow(t), k=3, concurrency=2) \
        .to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["video_id", "frame_index"]), preserve_index=False)
