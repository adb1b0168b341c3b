"""Durable single-writer manifest files (SURVEY §1.4 commit story).

The reference keeps its durable bookkeeping in BadgerDB, whose writes are
atomic (checkpoint.go:82-211). Round 2 appended JSONL with a local
`open(..., "a")` — correct on one driver until a crash tears a line. This
module replaces in-place appends with the write-temp + atomic-rename
protocol:

  read current manifest -> rewrite whole file to `<path>.tmp.<token>`
  (flush + fsync) -> `os.replace` onto the final name.

`os.replace` maps to rename(2) — atomic on POSIX and on HDFS; on
object stores the same protocol holds with a conditional PUT of the
manifest object (put-if-match on the previous version). Readers therefore
always see a complete previous or complete next manifest, never a torn
line — the property the exported-window / unit-done markers need so a
crash between a sink write and its mark leads to an idempotent re-export,
not a half-recorded one.

Manifests here are driver-side bookkeeping, rewritten wholesale per
append. That is only O(1) amortized if the record count stays bounded:
per-batch manifests (streaming epoch/metrics, one record per micro-batch)
would otherwise rewrite O(all batches ever) per batch — a months-long
1-batch/s stream rewrites ~10^5 records each time. Writers with that
growth profile must fold closed-out records into a summary
(streaming.pipeline.compact_manifests), keeping every manifest at
O(open records). Single-writer by design (one driver owns a state_dir),
as with the reference's single-process Badger instance.
"""

from __future__ import annotations

import json
import os
import uuid


def read_jsonl(path: str) -> "list[dict]":
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def write_jsonl_atomic(path: str, records: "list[dict]") -> None:
    """Replace `path` with `records`, atomically (temp + fsync + rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def append_jsonl_atomic(path: str, new_records: "list[dict]") -> None:
    """Append records via read + whole-file atomic replace (never an
    in-place append, so a crash mid-call leaves the previous manifest
    intact and complete)."""
    write_jsonl_atomic(path, read_jsonl(path) + list(new_records))


def upsert_jsonl_atomic(path: str, rec: dict, key_fields: "tuple[str, ...]") -> None:
    """Replace-or-append by key — an at-least-once writer (micro-batch
    replay, flush re-run) rewrites its own record instead of duplicating
    it, keeping sum-over-records semantics exactly-once."""

    def key(r: dict):
        return tuple(_norm_key(r.get(k)) for k in key_fields)

    kept = [r for r in read_jsonl(path) if key(r) != key(rec)]
    write_jsonl_atomic(path, kept + [rec])


def _norm_key(v):
    if isinstance(v, list):
        return tuple(sorted((x is None, x) for x in v))
    return v
