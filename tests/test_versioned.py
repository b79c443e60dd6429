"""Versioned tables: time travel, history-preserving upsert, atomic
pointer, retention that never deletes the live version."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.pipeline.versioned import (
    expire_versions,
    read_versioned,
    upsert_versioned,
    write_versioned,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, val string, ver int")


def test_write_read_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_versioned(spark, _df(spark, [(1, "a", 1), (2, "b", 1)]), path)
    assert v1 == 1
    v2 = upsert_versioned(
        spark, path, _df(spark, [(2, "B", 2), (3, "c", 2)]), "k", "ver"
    )
    assert v2 == 2
    # latest follows the pointer: merged state
    latest = {
        r["k"]: r["val"] for r in read_versioned(spark, path).collect()
    }
    assert latest == {1: "a", 2: "B", 3: "c"}, latest
    # time travel: version 1 is untouched history
    old = {
        r["k"]: r["val"]
        for r in read_versioned(spark, path, version=1).collect()
    }
    assert old == {1: "a", 2: "b"}, old


def test_upsert_tie_prefers_update_side(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "old", 5)]), path)
    upsert_versioned(spark, path, _df(spark, [(1, "new", 5)]), "k", "ver")
    got = read_versioned(spark, path).collect()
    assert [(r["k"], r["val"]) for r in got] == [(1, "new")], got


def test_expire_keeps_newest_and_never_the_live_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(1, 5):
        write_versioned(spark, _df(spark, [(1, f"v{i}", i)]), path)
    deleted = expire_versions(spark, path, keep=2)
    assert deleted == [1, 2], deleted
    # survivors: 3 and 4; 4 is live
    assert read_versioned(spark, path).collect()[0]["val"] == "v4"
    assert read_versioned(spark, path, version=3).collect()[0]["val"] == "v3"
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, path, version=1)


def test_missing_pointer_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, str(tmp_path / "absent"))


def test_diff_versions_classifies_changes(spark, tmp_path):
    """v1 {1:a, 2:b, 4:d} → v2 {1:a, 2:B, 3:c}: 2 changed, 3 added,
    4 removed, 1 (identical) omitted."""
    from etl_pipeline_example_spark.pipeline.versioned import diff_versions

    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(1, "a", 1), (2, "b", 1), (4, "d", 1)]), path
    )
    write_versioned(
        spark, _df(spark, [(1, "a", 1), (2, "B", 2), (3, "c", 2)]), path
    )
    got = [
        (r["k"], r["change"])
        for r in diff_versions(spark, path, 1, 2, "k").collect()
    ]
    assert got == [(2, "changed"), (3, "added"), (4, "removed")], got


def test_versioned_random_op_sequence_invariants(spark, tmp_path):
    """A fixed-seed randomized sequence of write/upsert/expire ops: the
    pointer always resolves to the newest version, version numbers are
    strictly increasing, every retained version time-travels to exactly
    the frame that produced it, and expiry never deletes the live one."""
    import random

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_pointer,
        _versions,
    )

    rng = random.Random(20260815)
    path = str(tmp_path / "tbl")
    recorded: dict[int, dict[int, str]] = {}

    def snapshot_state(version):
        recorded[version] = {
            r["k"]: r["val"]
            for r in read_versioned(spark, path, version=version).collect()
        }

    state: dict[int, tuple[str, int]] = {}
    v = write_versioned(spark, _df(spark, [(1, "init", 1)]), path)
    state = {1: ("init", 1)}
    snapshot_state(v)
    for step in range(8):
        op = rng.choice(["upsert", "upsert", "expire"])
        if op == "upsert":
            k = rng.randint(1, 4)
            ver = rng.randint(1, 9)
            val = f"s{step}"
            v2 = upsert_versioned(
                spark, path, _df(spark, [(k, val, ver)]), "k", "ver"
            )
            assert v2 == v + 1, (v, v2)
            v = v2
            cur = state.get(k)
            if cur is None or ver >= cur[1]:
                state[k] = (val, ver)
            snapshot_state(v)
            # latest must equal the model
            latest = {
                r["k"]: (r["val"], r["ver"])
                for r in read_versioned(spark, path).collect()
            }
            assert latest == state, (latest, state)
        else:
            expire_versions(spark, path, keep=2)
            live = _read_pointer(spark, path)
            assert live == v
            recorded_alive = {
                w: rec for w, rec in recorded.items()
                if w in _versions(spark, path)
            }
            recorded.clear()
            recorded.update(recorded_alive)
        # every retained version still reads back exactly as written
        for w, want in recorded.items():
            got = {
                r["k"]: r["val"]
                for r in read_versioned(spark, path, version=w).collect()
            }
            assert got == want, (w, got, want)
