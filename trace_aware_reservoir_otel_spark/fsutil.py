"""Durable single-writer manifest files (SURVEY §1.4 commit story).

The reference keeps its durable bookkeeping in BadgerDB, whose writes are
atomic (checkpoint.go:82-211). Round 2 appended JSONL with a local
`open(..., "a")` — correct on one driver until a crash tears a line. This
module replaces in-place appends with an atomic-replace protocol behind a
pluggable `Committer`:

  read current manifest -> rewrite whole file -> committer.replace(path)

`Committer.replace` is THE atomicity primitive — everything above it
(manifest appends/upserts here, the snapshot pointer swap in
plans/commit.py) only assumes "readers see the complete previous or the
complete next contents, never a torn state". Two bindings:

 - `LocalRenameCommitter` (default): write-temp + flush + fsync +
   `os.replace`. `os.replace` maps to rename(2) — atomic on POSIX and on
   HDFS. Single-writer by design (one driver owns a state_dir), as with
   the reference's single-process Badger instance.
 - `ConditionalPutCommitter` (documented object-store binding): on
   S3/GCS the same protocol is a conditional PUT of the manifest object —
   `If-Match: <etag>` (S3) / `x-goods-if-generation-match` (GCS) against
   the version read at the start of the read-modify-write, retrying the
   whole cycle on precondition failure. That also gives MULTI-writer
   safety (lost updates become retries) which the rename binding does not
   claim. No object store exists in this environment, so the class is an
   honest stub that documents the contract and raises on use.

Manifests here are driver-side bookkeeping, rewritten wholesale per
append. That is only O(1) amortized if the record count stays bounded:
per-batch manifests (streaming epoch/metrics, one record per micro-batch)
would otherwise rewrite O(all batches ever) per batch — a months-long
1-batch/s stream rewrites ~10^5 records each time. Writers with that
growth profile must fold closed-out records into a summary
(streaming.pipeline.compact_manifests), keeping every manifest at
O(open records).
"""

from __future__ import annotations

import json
import os
import uuid


class Committer:
    """Atomic-replace primitive: `replace(path, data)` must leave `path`
    holding either its complete previous contents or exactly `data`,
    under a crash at any point — never a torn intermediate."""

    def replace(self, path: str, data: bytes) -> None:
        raise NotImplementedError


class LocalRenameCommitter(Committer):
    """POSIX/HDFS binding: temp file + fsync + rename(2)."""

    def replace(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)


class ConditionalPutCommitter(Committer):
    """Object-store binding (S3/GCS): read the object's version tag,
    rebuild the manifest, PUT with if-match on that tag, retry the whole
    read-modify-write on precondition failure. Extends the single-writer
    guarantee to multiple writers. Stub: no object store (or its SDK)
    exists in this container."""

    def __init__(self, bucket: str):
        self.bucket = bucket

    def replace(self, path: str, data: bytes) -> None:
        raise NotImplementedError(
            "conditional-PUT committer requires an object-store SDK; "
            "bind boto3/google-cloud-storage here in a real deployment"
        )


_DEFAULT_COMMITTER: Committer = LocalRenameCommitter()


def get_committer() -> Committer:
    return _DEFAULT_COMMITTER


def set_committer(committer: Committer) -> Committer:
    """Swap the process-wide committer binding (tests inject faulty ones);
    returns the previous binding so callers can restore it."""
    global _DEFAULT_COMMITTER
    prev = _DEFAULT_COMMITTER
    _DEFAULT_COMMITTER = committer
    return prev


def read_jsonl(path: str) -> "list[dict]":
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def write_jsonl_atomic(path: str, records: "list[dict]") -> None:
    """Replace `path` with `records`, atomically (via the Committer)."""
    data = "".join(json.dumps(rec) + "\n" for rec in records).encode()
    get_committer().replace(path, data)


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
