"""Atomic JSONL manifest protocol (fsutil): append/upsert never tear, and
upsert replaces by key — the exactly-once counter semantics the streaming
manifests rely on."""

import os

from trace_aware_reservoir_otel_spark import fsutil


def test_append_and_read(tmp_path):
    p = str(tmp_path / "m.jsonl")
    assert fsutil.read_jsonl(p) == []
    fsutil.append_jsonl_atomic(p, [{"a": 1}])
    fsutil.append_jsonl_atomic(p, [{"a": 2}, {"a": 3}])
    assert [r["a"] for r in fsutil.read_jsonl(p)] == [1, 2, 3]
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]  # no temp litter


def test_upsert_replaces_by_key(tmp_path):
    p = str(tmp_path / "m.jsonl")
    fsutil.upsert_jsonl_atomic(p, {"batch_id": 0, "n": 10}, ("batch_id",))
    fsutil.upsert_jsonl_atomic(p, {"batch_id": 1, "n": 20}, ("batch_id",))
    fsutil.upsert_jsonl_atomic(p, {"batch_id": 0, "n": 11}, ("batch_id",))
    recs = {r["batch_id"]: r["n"] for r in fsutil.read_jsonl(p)}
    assert recs == {0: 11, 1: 20}


def test_upsert_list_key_is_order_insensitive(tmp_path):
    p = str(tmp_path / "m.jsonl")
    fsutil.upsert_jsonl_atomic(
        p, {"type": "export", "windows": [60, 0, None], "rows_total": 5},
        ("type", "windows"),
    )
    fsutil.upsert_jsonl_atomic(
        p, {"type": "export", "windows": [None, 0, 60], "rows_total": 7},
        ("type", "windows"),
    )
    recs = fsutil.read_jsonl(p)
    assert len(recs) == 1 and recs[0]["rows_total"] == 7


def test_write_is_atomic_replace(tmp_path):
    p = str(tmp_path / "m.jsonl")
    fsutil.write_jsonl_atomic(p, [{"v": i} for i in range(100)])
    fsutil.write_jsonl_atomic(p, [{"v": -1}])
    assert [r["v"] for r in fsutil.read_jsonl(p)] == [-1]


class _FaultyCommitter:
    """Wraps the real committer; raises at a chosen call index — before
    the replace takes effect (the crash point the protocol must survive)."""

    def __init__(self, fail_at: int):
        from trace_aware_reservoir_otel_spark.fsutil import LocalRenameCommitter

        self.inner = LocalRenameCommitter()
        self.calls = 0
        self.fail_at = fail_at

    def replace(self, path, data):
        self.calls += 1
        if self.calls == self.fail_at:
            raise OSError("injected fault before atomic replace")
        self.inner.replace(path, data)


def test_fault_during_manifest_replace_leaves_previous_intact(tmp_path):
    """A crash during the manifest rewrite must leave the COMPLETE
    previous manifest — the exported-mark / epoch writers depend on this
    (torn line => undetectable double-export on restart)."""
    import pytest

    from trace_aware_reservoir_otel_spark import fsutil

    p = str(tmp_path / "m.jsonl")
    fsutil.append_jsonl_atomic(p, [{"bucket": 1, "batch_id": 7}])
    before = fsutil.read_jsonl(p)

    prev = fsutil.set_committer(_FaultyCommitter(fail_at=1))
    try:
        with pytest.raises(OSError, match="injected"):
            fsutil.append_jsonl_atomic(p, [{"bucket": 2, "batch_id": 8}])
        assert fsutil.read_jsonl(p) == before  # complete previous manifest
        # retry under a healed committer lands the full new contents
        fsutil.set_committer(prev)
        fsutil.append_jsonl_atomic(p, [{"bucket": 2, "batch_id": 8}])
        assert fsutil.read_jsonl(p) == before + [{"bucket": 2, "batch_id": 8}]
    finally:
        fsutil.set_committer(prev)


def test_conditional_put_committer_is_an_honest_stub():
    import pytest

    from trace_aware_reservoir_otel_spark.fsutil import ConditionalPutCommitter

    with pytest.raises(NotImplementedError, match="object-store"):
        ConditionalPutCommitter("bucket").replace("x", b"")
