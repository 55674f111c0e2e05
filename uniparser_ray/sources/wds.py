"""WebDataset-style tar export/ingest for the image+caption table.

Large-scale image training pipelines exchange data as WebDataset tar
shards (public webdataset convention: one tar member per sample
component, members of one sample share a basename stem and sit
adjacent — ``{key}.img`` + ``{key}.txt`` here).  This module gives
the engine that interchange surface on the image axis, mirroring the
WET surface on the page axis (sources/warc.py):

* ``write_wds_shard`` — one tar written atomically (tmp + rename),
  deterministic member metadata (mtime=0, uid/gid=0, USTAR) so a
  rewrite is byte-identical; idempotent like the Lance fragment
  writer so a resumed export skips finished shards.
* ``export_wds`` — the Lance-layout image table → one tar PER
  FRAGMENT, task-parallel (each task reads one fragment parquet and
  writes one shard), so the export scales with the table's own
  partitioning and a failed run resumes by skipping existing shards.
* ``read_wds`` — distributed ingest back to
  (image_id, bytes, caption, shard) rows: one task per shard,
  samples re-assembled by basename stem per the convention.

Payload fidelity is value-checked by ``images_wds_roundtrip``
(pipelines/images_q.py) against a DuckDB read of the SAME fragments
— two independent serializations compared by md5.
"""
from __future__ import annotations

import io
import os
import tarfile
import tempfile
from pathlib import Path
from typing import List

import pyarrow as pa


def _member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(payload))


def write_wds_shard(rows, path: str, overwrite: bool = False) -> str:
    """rows: iterable of (key, img_bytes, caption_str).  Atomic +
    idempotent (existing shard kept unless overwrite); deterministic
    bytes (fixed member metadata, USTAR) so rewrites are identical."""
    p = Path(path)
    if p.exists() and not overwrite:
        return str(p)
    p.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=p.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            with tarfile.open(fileobj=f, mode="w",
                              format=tarfile.USTAR_FORMAT) as tar:
                for key, img, caption in rows:
                    _member(tar, f"{key}.img", img)
                    _member(tar, f"{key}.txt",
                            (caption or "").encode("utf-8"))
        os.replace(tmp, p)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return str(p)


def parse_wds(blob: bytes, shard: str):
    """Yield (key, img_bytes, caption_str, shard) per sample —
    members grouped by basename stem, adjacent per the convention
    (a stem's components may arrive in either order)."""
    cur_key, cur = None, {}
    with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
        for m in tar:
            stem, _, ext = m.name.rpartition(".")
            if stem != cur_key:
                if cur_key is not None:
                    yield (cur_key, cur.get("img", b""),
                           cur.get("txt", b"").decode("utf-8"), shard)
                cur_key, cur = stem, {}
            cur[ext] = tar.extractfile(m).read()
    if cur_key is not None:
        yield (cur_key, cur.get("img", b""),
               cur.get("txt", b"").decode("utf-8"), shard)


def shard_name(fragment_file: str) -> str:
    """frag-<name>.parquet -> <name> (the shard id both sides use)."""
    stem = Path(fragment_file).stem
    return stem[5:] if stem.startswith("frag-") else stem


def export_wds(table, out_dir: str,
               key_col: str = "image_id", bytes_col: str = "bytes",
               caption_col: str = "caption") -> List[str]:
    """Lance-layout table → one WebDataset tar per fragment,
    task-parallel.  Returns the shard paths (sorted)."""
    import ray.data as rd

    rows = [{"src": f,
             "dst": str(Path(out_dir) / (shard_name(f) + ".tar"))}
            for f in table.fragment_files()]

    def export_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        done = []
        for r in batch.to_pylist():
            t = pq.read_table(r["src"],
                              columns=[key_col, bytes_col, caption_col])
            write_wds_shard(
                zip(t[key_col].to_pylist(), t[bytes_col].to_pylist(),
                    t[caption_col].to_pylist()), r["dst"])
            done.append(r["dst"])
        return pa.table({"path": pa.array(done, pa.string())})

    out = rd.from_items(rows).map_batches(
        export_one, batch_format="pyarrow", batch_size=1).to_pandas()
    return sorted(out["path"])


def read_wds(paths: List[str]):
    """Distributed WebDataset ingest → Dataset of
    (image_id, bytes, caption, shard)."""
    import ray.data as rd

    def parse_one(batch: pa.Table) -> pa.Table:
        keys, imgs, caps, shards = [], [], [], []
        for p in batch.to_pylist():
            shard = Path(p["path"]).stem
            with open(p["path"], "rb") as f:
                for key, img, caption, sh in parse_wds(f.read(), shard):
                    keys.append(key)
                    imgs.append(img)
                    caps.append(caption)
                    shards.append(sh)
        return pa.table({"image_id": pa.array(keys, pa.string()),
                         "bytes": pa.array(imgs, pa.large_binary()),
                         "caption": pa.array(caps, pa.string()),
                         "shard": pa.array(shards, pa.string())})

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse_one, batch_format="pyarrow", batch_size=1)
