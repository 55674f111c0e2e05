"""Lance-*layout* columnar store: fragment files + versioned manifest.

pylance cannot be installed in this sandbox, so "Lance tables" are
realized as the Lance storage *layout* over Parquet containers:

    table_dir/
      data/frag-<name>.parquet          immutable fragment files
      _versions/<version>.json          manifest per committed version
      _latest                           pointer file: newest version int

A manifest lists the fragment file names, per-fragment row counts and
user metadata.  Commits are atomic (manifest written to a temp name
then renamed) and append-only: version N+1 = version N's fragments ±
additions/removals.  This gives the engine the three Lance properties
the north rule leans on: versioned snapshots, per-partition fragment
files (resumable writes — a rerun skips fragments already present in
the target version), and fast append without rewriting data.

Readers hand the fragment path list straight to
``ray.data.read_parquet`` so scans stream fragment-parallel.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq


class LanceLayoutTable:
    def __init__(self, root: str):
        self.root = Path(root)
        self.data_dir = self.root / "data"
        self.version_dir = self.root / "_versions"

    # -- write ------------------------------------------------------------
    def ensure_dirs(self) -> None:
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.version_dir.mkdir(parents=True, exist_ok=True)

    def fragment_path(self, name: str) -> Path:
        return self.data_dir / f"frag-{name}.parquet"

    def has_fragment(self, name: str) -> bool:
        return self.fragment_path(name).exists()

    def write_fragment(self, table: pa.Table, name: str,
                       overwrite: bool = False) -> str:
        """Write one immutable fragment atomically; returns file name.

        Idempotent for resumable jobs: an existing fragment is kept
        unless ``overwrite`` (rerunning a partition writer is a no-op).
        """
        self.ensure_dirs()
        path = self.fragment_path(name)
        if path.exists() and not overwrite:
            return path.name
        fd, tmp = tempfile.mkstemp(dir=self.data_dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp, compression="zstd")
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return path.name

    def latest_version(self) -> int:
        ptr = self.root / "_latest"
        if ptr.exists():
            try:
                return int(ptr.read_text().strip())
            except ValueError:
                pass
        versions = sorted(int(p.stem) for p in self.version_dir.glob("*.json")
                          ) if self.version_dir.exists() else []
        return versions[-1] if versions else 0

    def commit(self, fragment_names: List[str], metadata: Optional[dict] = None,
               base_version: Optional[int] = None) -> int:
        """New version = base version's fragments + the new ones."""
        self.ensure_dirs()
        base = self.latest_version() if base_version is None else base_version
        fragments: List[dict] = []
        if base:
            fragments = self.manifest(base)["fragments"]
        known = {f["file"] for f in fragments}
        for name in fragment_names:
            # names are paths relative to data/ (flat "frag-x.parquet" or
            # nested "round=3/part-0.parquet")
            path = self.data_dir / name
            if name in known:
                continue
            meta = pq.read_metadata(path)
            fragments.append({"file": name, "rows": meta.num_rows})
        version = base + 1
        manifest = {
            "version": version,
            "fragments": fragments,
            "rows": sum(f["rows"] for f in fragments),
            "metadata": metadata or {},
        }
        tmp = self.version_dir / f".{version}.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self.version_dir / f"{version}.json")
        (self.root / "_latest").write_text(str(version))
        return version

    def rollback_fragments(self, keep_pred, metadata: Optional[dict] = None,
                           ) -> int:
        """Commit a new version keeping only the base version's
        fragments passing ``keep_pred(file_name)`` — the crash-recovery
        counterpart of ``commit()`` (a crawl round registers its
        fragments mid-round, so a crash before the round's state commit
        leaves orphans in the manifest).  Returns the base version
        unchanged when nothing is dropped (no empty no-op versions);
        physical file removal is the caller's concern."""
        base = self.latest_version()
        if not base:
            return 0
        fragments = self.manifest(base)["fragments"]
        keep = [f for f in fragments if keep_pred(f["file"])]
        if len(keep) == len(fragments):
            return base
        version = base + 1
        manifest = {
            "version": version,
            "fragments": keep,
            "rows": sum(f["rows"] for f in keep),
            "metadata": metadata or {},
        }
        tmp = self.version_dir / f".{version}.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self.version_dir / f"{version}.json")
        (self.root / "_latest").write_text(str(version))
        return version

    def overwrite(self, table: pa.Table, name: str = "0000",
                  metadata: Optional[dict] = None) -> int:
        """Single-fragment convenience write + commit (small tables)."""
        frag = self.write_fragment(table, name, overwrite=True)
        # fresh lineage: new version containing only this fragment
        self.ensure_dirs()
        version = self.latest_version() + 1
        manifest = {
            "version": version,
            "fragments": [{"file": frag, "rows": table.num_rows}],
            "rows": table.num_rows,
            "metadata": metadata or {},
        }
        (self.version_dir / f"{version}.json").write_text(json.dumps(manifest))
        (self.root / "_latest").write_text(str(version))
        return version

    # -- read -------------------------------------------------------------
    def exists(self) -> bool:
        return self.version_dir.exists() and self.latest_version() > 0

    def manifest(self, version: Optional[int] = None) -> dict:
        version = version or self.latest_version()
        return json.loads((self.version_dir / f"{version}.json").read_text())

    def fragment_files(self, version: Optional[int] = None) -> List[str]:
        if not self.exists():
            return []
        return [str(self.data_dir / f["file"])
                for f in self.manifest(version)["fragments"]]

    def count_rows(self, version: Optional[int] = None) -> int:
        if not self.exists():
            return 0
        return self.manifest(version)["rows"]

    def to_table(self, version: Optional[int] = None,
                 columns: Optional[List[str]] = None) -> pa.Table:
        files = self.fragment_files(version)
        if not files:
            return pa.table({})
        return pa.concat_tables(pq.read_table(f, columns=columns) for f in files)

    def read_dataset(self, version: Optional[int] = None,
                     columns: Optional[List[str]] = None, **kwargs):
        """ray.data.Dataset over this version's fragments (lazy)."""
        import ray.data
        return ray.data.read_parquet(self.fragment_files(version),
                                     columns=columns, **kwargs)
