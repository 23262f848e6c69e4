"""Shared snapshot/manifest helpers for the iterative kernels.

Every iterative operator (pagerank, label propagation, connected components)
checkpoints its state DataFrame as an iteration-stamped Parquet snapshot
(Iceberg-style layout: a directory per iteration + a JSON manifest), so a
killed run resumes from the last completed iteration with identical results.
The manifest carries per-iteration metrics AND per-partition lineage for the
latest snapshot: one entry per Parquet part-file (file name, bytes) — enough
to audit which partition wrote what and to detect partial writes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def partition_lineage(path: str) -> list[dict]:
    """Per-partition file stats of a Parquet snapshot directory."""
    out = []
    try:
        for name in sorted(os.listdir(path)):
            if name.startswith("part-") and not name.endswith(".crc"):
                out.append(
                    {"file": name, "bytes": os.path.getsize(os.path.join(path, name))}
                )
    except OSError:
        pass
    return out


def load_manifest(checkpoint_dir: str) -> dict | None:
    path = os.path.join(checkpoint_dir, "manifest.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def save_manifest(checkpoint_dir: str, manifest: dict) -> None:
    path = os.path.join(checkpoint_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn manifest


def snapshot_state(
    state: DataFrame,
    checkpoint_dir: str,
    it: int,
    manifest: dict,
) -> str:
    """Write `state` as the iteration-`it` snapshot, then publish the manifest
    (snapshot first, manifest second — the manifest only ever names complete
    snapshots). Adds completed_iter + per-partition lineage to `manifest`.
    Returns the snapshot path."""
    snap = os.path.join(checkpoint_dir, f"iter={it}")
    state.write.mode("overwrite").parquet(snap)
    manifest = dict(manifest)
    manifest["completed_iter"] = it
    manifest["snapshot_partitions"] = partition_lineage(snap)
    save_manifest(checkpoint_dir, manifest)
    return snap


def read_snapshot(spark: SparkSession, checkpoint_dir: str, it: int) -> DataFrame:
    return spark.read.parquet(os.path.join(checkpoint_dir, f"iter={it}"))
