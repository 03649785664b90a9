"""Iceberg-layout table/manifest layer for the index warehouse.

The reference gets atomic multi-structure commits from RocksDB
WriteBatch (``/root/reference/konlsearch/index.py:130-267``); we get the
same guarantee from snapshot-style metadata commits: every table is a
directory of immutable Parquet files, and a JSON manifest written *last*
via tmp-file + atomic rename is the commit point. A crashed build leaves
staging data but no manifest entry → the resume path re-runs it
(idempotent). Swapping this for a real Iceberg catalog is a config
change (the sandbox has no Iceberg runtime jars — SURVEY §7.1).

Layout of an index root:

    root/
      _meta/manifest.json       # snapshot pointer + corpus stats
      _meta/segments.json       # per-segment build checkpoints + metrics
      docs/                     # parquet, range-partitioned by doc_id
      postings/                 # parquet, dir-partitioned by term_bucket
      token_dict/               # parquet, sorted by decomposed
      query_log/                # append-only parquet
      token_freq/               # parquet (search-frequency aggregate)
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Dict, Optional


class IndexCatalog:
    """Metadata layer for one index root.

    ALL catalog metadata I/O (manifest, segment checkpoints, sequence
    markers) goes through the LOCAL filesystem — the embedded
    single-process model the reference uses (RocksDB on a local path).
    A non-local root (``hdfs://``, ``s3://``…) fails LOUDLY at
    construction instead of silently returning empty metadata: cluster
    deployments swap exactly this layer (an Iceberg/HMS catalog or a
    Hadoop-FileSystem port of these few methods); the table data itself
    is already read/written through Spark and needs no change.
    """

    def __init__(self, root: str):
        if "://" in root and not root.startswith("file:"):
            raise NotImplementedError(
                f"IndexCatalog metadata I/O is local-filesystem only; got "
                f"{root!r} — swap the catalog layer (see class docstring) "
                "for cluster filesystems")
        self.root = root
        self.meta_dir = os.path.join(root, "_meta")

    # table paths ----------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.meta_dir, "manifest.json")

    @property
    def segments_path(self) -> str:
        return os.path.join(self.meta_dir, "segments.json")

    # atomic JSON commits ----------------------------------------------------
    def _write_json_atomic(self, path: str, payload: Dict[str, Any]) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.meta_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, ensure_ascii=False)
        os.replace(tmp, path)  # atomic on POSIX

    def commit_manifest(self, manifest: Dict[str, Any]) -> None:
        manifest = dict(manifest)
        manifest["committed_at"] = time.time()
        self._write_json_atomic(self.manifest_path, manifest)

    def read_manifest(self) -> Optional[Dict[str, Any]]:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    # per-segment checkpoints (north rule: resumable with lineage+metrics) --
    def read_segments(self) -> Dict[str, Any]:
        if not os.path.exists(self.segments_path):
            return {"segments": {}}
        with open(self.segments_path) as f:
            return json.load(f)

    def commit_segment(self, segment_id: str, entry: Dict[str, Any]) -> None:
        state = self.read_segments()
        entry = dict(entry)
        entry["committed_at"] = time.time()
        state["segments"][segment_id] = entry
        self._write_json_atomic(self.segments_path, state)

    def segment_committed(self, segment_id: str, fingerprint: str) -> bool:
        entry = self.read_segments()["segments"].get(segment_id)
        return bool(entry) and entry.get("fingerprint") == fingerprint

    # sequence high-water markers (query-log hot path) -----------------------
    #
    # The marker is a zero-byte file named by the last reserved seq id
    # inside ``<table>/_seq/`` (the leading underscore hides the dir
    # from Spark's file index). Reading = one listdir; reserving = one
    # touch — no manifest read-modify-write on the query hot path.

    def _marker_dir(self, table: str) -> str:
        return os.path.join(self.table_path(table), "_seq")

    def marker_last(self, table: str) -> int:
        """Highest reserved sequence id for ``table`` (0 if none)."""
        d = self._marker_dir(table)
        if not os.path.isdir(d):
            return 0
        names = [n for n in os.listdir(d) if n.isdigit()]
        return max((int(n) for n in names), default=0)

    def marker_reserve(self, table: str, new_last: int) -> None:
        """Advance the high-water mark to ``new_last``. Callers reserve
        BEFORE writing the rows: a crash between the reserve and the
        data write leaves a harmless seq gap, never a reusable range."""
        d = self._marker_dir(table)
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, f"{new_last:020d}"), "w").close()


# ---------------------------------------------------------------------------
# Warehouse-level operations (reference: search.py:16-51 — open DB,
# index catalog scan, destroy)
# ---------------------------------------------------------------------------

def get_all_indexes(warehouse: str) -> list:
    """List committed index roots under a warehouse dir (S3: the
    reference scans catalog keys by prefix, search.py:35-45)."""
    import glob
    out = []
    for manifest in sorted(glob.glob(
            os.path.join(warehouse, "*", "_meta", "manifest.json"))):
        out.append(os.path.basename(os.path.dirname(os.path.dirname(manifest))))
    return out


def destroy_index(warehouse: str, name: str) -> None:
    """Drop one index (S4: KonlSearch.destroy, search.py:50-51)."""
    import shutil
    path = os.path.join(warehouse, name)
    if not os.path.exists(os.path.join(path, "_meta")):
        raise FileNotFoundError(f"not an index root: {path}")
    shutil.rmtree(path)
