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
        for r in diff_versions(spark, path, 1, 2, "k", sort=True).collect()
    ]
    assert got == [(2, "changed"), (3, "added"), (4, "removed")], got


def _version_data_dirs(root, version):
    """Data dirs written FOR a version: ``v=NNNNNN-<writer token>``
    (one per writing commit; metadata-only commits write none)."""
    import glob
    import os

    return sorted(glob.glob(os.path.join(root, "data", f"v={version:06d}*")))


def _data_bytes(root, version):
    """Total bytes and file count of the data files written FOR a
    specific version (pyarrow-free: plain os.walk over the local dir)."""
    import os

    total, n = 0, 0
    for vdir in _version_data_dirs(root, version):
        for dirpath, _dirs, files in os.walk(vdir):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                total += os.path.getsize(os.path.join(dirpath, f))
                n += 1
    return total, n


def test_upsert_rewrites_only_affected_buckets(spark, tmp_path):
    """The manifest contract at the byte level: a 1-key upsert into an
    8-bucket table writes ~1/8 of the v1 bytes (one bucket dir), and
    the v2 manifest re-references 7 of v1's files unchanged."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    big = spark.createDataFrame(
        [(k, "x" * 50, 1) for k in range(800)], "k bigint, val string, ver int"
    )
    write_versioned(spark, big, path, key="k", nbuckets=8)
    upsert_versioned(
        spark, path, _df(spark, [(3, "NEW", 2)]), "k", "ver"
    )
    v1_bytes, v1_files = _data_bytes(path, 1)
    v2_bytes, v2_files = _data_bytes(path, 2)
    assert v1_files >= 8, v1_files
    assert v2_files < v1_files / 4, (v1_files, v2_files)
    assert v2_bytes < v1_bytes / 3, (v1_bytes, v2_bytes)
    m1 = _read_manifest(spark, path, 1)
    m2 = _read_manifest(spark, path, 2)
    shared = {e["path"] for e in m1["files"]} & {
        e["path"] for e in m2["files"]
    }
    assert len(shared) == len(m1["files"]) - sum(
        1 for e in m1["files"] if e["bucket"] == _bucket_of(spark, 3, 8)
    ), (m1["files"], m2["files"])
    # and the merged content is right: key 3 updated, neighbors intact
    latest = {
        r["k"]: r["val"] for r in read_versioned(spark, path).collect()
    }
    assert latest[3] == "NEW" and latest[2] == "x" * 50 and len(latest) == 800


def _bucket_of(spark, k, nbuckets):
    from etl_pipeline_example_spark.pipeline.versioned import _bucket_expr

    return (
        spark.range(1)
        .select(_bucket_expr("id", nbuckets).alias("b"))
        .selectExpr(f"pmod(xxhash64(cast({k} as bigint)), {nbuckets}) as b")
        .collect()[0]["b"]
    )


def test_expire_gc_keeps_files_shared_with_retained_versions(
    spark, tmp_path
):
    """After expiring v1, v1-era files still referenced by the v2/v3
    manifests must survive GC; truly unreferenced ones are deleted."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    big = spark.createDataFrame(
        [(k, "x" * 50, 1) for k in range(800)], "k bigint, val string, ver int"
    )
    write_versioned(spark, big, path, key="k", nbuckets=8)
    upsert_versioned(spark, path, _df(spark, [(3, "A", 2)]), "k", "ver")
    upsert_versioned(spark, path, _df(spark, [(3, "B", 3)]), "k", "ver")
    deleted = expire_versions(spark, path, keep=2)
    assert deleted == [1], deleted
    # v2 still reads in full: its manifest shares v1-era bucket files
    v2 = {r["k"]: r["val"] for r in read_versioned(spark, path, version=2).collect()}
    assert len(v2) == 800 and v2[3] == "A"
    # every file on disk is referenced by a retained manifest
    referenced = set()
    for v in (2, 3):
        referenced.update(
            e["path"] for e in _read_manifest(spark, path, v)["files"]
        )
    on_disk = set()
    for dirpath, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if not f.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(dirpath, f), path)
                on_disk.add(rel)
    assert on_disk == referenced, (on_disk - referenced, referenced - on_disk)


def test_concurrent_version_commit_raises(spark, tmp_path):
    """The create-exclusive manifest is the writer lock: committing the
    same version twice raises ConcurrentWriteError."""
    import pytest as _pytest

    from etl_pipeline_example_spark.pipeline.versioned import (
        ConcurrentWriteError,
        _commit_manifest,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path)
    with _pytest.raises(ConcurrentWriteError):
        _commit_manifest(spark, path, 1, {"files": []})


def test_read_pointer_falls_back_to_newest_manifest(spark, tmp_path):
    """Crash recovery: with the pointer file gone, latest reads resolve
    to the newest committed manifest instead of failing."""
    import os

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path)
    write_versioned(spark, _df(spark, [(1, "b", 2)]), path)
    os.remove(os.path.join(path, "_latest"))
    got = read_versioned(spark, path).collect()
    assert [(r["k"], r["val"]) for r in got] == [(1, "b")], got


def test_diff_versions_sees_added_column(spark, tmp_path):
    """Schema evolution: a column present only in v_to participates in
    the diff (null-padded on the v_from side), so rows differing only
    there report 'changed' — the round-10 ADVICE fix."""
    from etl_pipeline_example_spark.pipeline.versioned import diff_versions

    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        spark.createDataFrame([(1, "a")], "k bigint, val string"),
        path,
    )
    write_versioned(
        spark,
        spark.createDataFrame(
            [(1, "a", "extra")], "k bigint, val string, note string"
        ),
        path,
    )
    got = [
        (r["k"], r["change"])
        for r in diff_versions(spark, path, 1, 2, "k", sort=True).collect()
    ]
    assert got == [(1, "changed")], got


def test_add_columns_is_metadata_only_and_null_pads(spark, tmp_path):
    """add_columns_versioned writes NO data files: the new manifest
    references v1's files byte-for-byte, old rows read back with the
    new column null, and a subsequent upsert carries real values."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        add_columns_versioned,
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    v2 = add_columns_versioned(spark, path, {"note": "string"})
    assert v2 == 2
    m1 = _read_manifest(spark, path, 1)
    m2 = _read_manifest(spark, path, 2)
    assert m1["files"] == m2["files"]  # zero data bytes moved
    assert _version_data_dirs(path, 2) == []
    got = read_versioned(spark, path).collect()
    assert [(r["k"], r["val"], r["note"]) for r in got] == [(1, "a", None)]
    # v1 time travel still reads the ORIGINAL schema
    assert "note" not in read_versioned(spark, path, version=1).columns
    # an upsert after the alter carries the new column end-to-end
    upd = spark.createDataFrame(
        [(2, "b", 2, "hello")], "k bigint, val string, ver int, note string"
    )
    upsert_versioned(spark, path, upd, "k", "ver")
    latest = {r["k"]: r["note"] for r in read_versioned(spark, path).collect()}
    assert latest == {1: None, 2: "hello"}, latest
    import pytest as _pytest

    with _pytest.raises(ValueError):
        add_columns_versioned(spark, path, {"val": "string"})


def test_compact_coalesces_fragmented_bucket(spark, tmp_path):
    """An unkeyed multi-partition write fragments bucket 0 into many
    files (the layer's one fragmentation source — keyed upserts always
    rewrite whole buckets); compaction coalesces it to one file and
    preserves content + history."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        compact_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, "x", 1) for k in range(200)], "k bigint, val string, ver int"
    ).repartition(6)
    write_versioned(spark, base, path)
    m1 = _read_manifest(spark, path, 1)
    assert len(m1["files"]) > 1, m1["files"]  # actually fragmented
    before = {
        r["k"]: r["val"] for r in read_versioned(spark, path).collect()
    }
    v2 = compact_versioned(spark, path)
    m2 = _read_manifest(spark, path, v2)
    assert len(m2["files"]) == 1, m2["files"]
    after = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert after == before and len(after) == 200
    # history intact: v1 still reads through its original small files
    assert {
        r["k"]: r["val"]
        for r in read_versioned(spark, path, version=1).collect()
    } == before


def test_compact_on_tidy_table_is_metadata_noop(spark, tmp_path):
    """A keyed table where every bucket already holds one file:
    compaction commits a new version whose manifest is the same file
    list — no data dir is written at all."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        compact_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, "x", 1) for k in range(200)], "k bigint, val string, ver int"
    )
    write_versioned(spark, base, path, key="k", nbuckets=4)
    v2 = compact_versioned(spark, path)
    assert _read_manifest(spark, path, v2)["files"] == _read_manifest(
        spark, path, 1
    )["files"]
    assert _version_data_dirs(path, 2) == []


def test_restore_rolls_back_as_new_version(spark, tmp_path):
    """Restore to v1 after a bad upsert: latest reads v1's content, the
    bad v2 stays readable for audit, the restore moved zero data bytes
    (same file list), and GC keeps files shared by the restore."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        restore_versioned,
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "good", 1)]), path, key="k")
    upsert_versioned(spark, path, _df(spark, [(1, "BAD", 2)]), "k", "ver")
    v3 = restore_versioned(spark, path, 1)
    assert v3 == 3
    assert [
        (r["k"], r["val"]) for r in read_versioned(spark, path).collect()
    ] == [(1, "good")]
    assert [
        (r["k"], r["val"])
        for r in read_versioned(spark, path, version=2).collect()
    ] == [(1, "BAD")]
    assert _read_manifest(spark, path, 3)["files"] == _read_manifest(
        spark, path, 1
    )["files"]
    assert _version_data_dirs(path, 3) == []
    # expire down to 2 versions: v1 goes, but its files survive because
    # the live restore (v3) references them
    expire_versions(spark, path, keep=2)
    assert [
        (r["k"], r["val"]) for r in read_versioned(spark, path).collect()
    ] == [(1, "good")]


def test_versioned_random_ops_with_maintenance_invariants(spark, tmp_path):
    """Fixed-seed random sequence over the FULL op set — upsert,
    expire, compact, restore, add_columns — with a model of every
    version's (k → val) content: the pointer always resolves newest,
    every retained version time-travels to exactly the content that
    committed it (maintenance ops never change content), restore
    replays an old state as the new head, and expiry never breaks a
    shared-file reader."""
    import random

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_pointer,
        _versions,
        add_columns_versioned,
        compact_versioned,
        restore_versioned,
        upsert_versioned,
        write_versioned,
    )

    rng = random.Random(20260816)
    path = str(tmp_path / "tbl")
    v = write_versioned(
        spark, _df(spark, [(1, "init", 1)]), path, key="k", nbuckets=4
    )
    state = {1: "init"}
    recorded = {v: dict(state)}
    added_cols = 0
    for step in range(10):
        op = rng.choice(["upsert", "upsert", "compact", "restore",
                         "expire", "addcol"])
        if op == "upsert":
            k, ver = rng.randint(1, 5), step + 2
            val = f"s{step}"
            v = upsert_versioned(
                spark, path, _df(spark, [(k, val, ver)]), "k", "ver"
            )
            state[k] = val
        elif op == "compact":
            v = compact_versioned(spark, path)
        elif op == "restore":
            target = rng.choice(_versions(spark, path))
            v = restore_versioned(spark, path, target)
            state = dict(recorded[target])
        elif op == "expire":
            expire_versions(spark, path, keep=3)
            recorded = {
                w: c for w, c in recorded.items()
                if w in _versions(spark, path)
            }
            assert _read_pointer(spark, path) == v
        else:
            added_cols += 1
            v = add_columns_versioned(
                spark, path, {f"extra{added_cols}": "string"}
            )
        if op != "expire":
            recorded[v] = dict(state)
            assert _read_pointer(spark, path) == v
            latest = {
                r["k"]: r["val"]
                for r in read_versioned(spark, path).collect()
            }
            assert latest == state, (step, op, latest, state)
        # every retained recorded version reads back exactly
        for w, want in recorded.items():
            got = {
                r["k"]: r["val"]
                for r in read_versioned(spark, path, version=w).collect()
            }
            assert got == want, (step, op, w, got, want)


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


def test_upsert_after_add_columns_touches_prealter_bucket(spark, tmp_path):
    """Round-11 ADVICE (high): the copy-on-write path must read touched
    bucket files under the MANIFEST schema. Files written before
    add_columns_versioned lack the added column; schema inference made
    the merge select crash with UNRESOLVED_COLUMN whenever an update key
    hashed into a pre-alter bucket. Upserting EVERY key guarantees at
    least one touched pre-alter file regardless of hashing."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        add_columns_versioned,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, "old", 1) for k in range(1, 9)], "k bigint, val string, ver int"
    )
    write_versioned(spark, base, path, key="k", nbuckets=4)
    add_columns_versioned(spark, path, {"note": "string"})
    upd = spark.createDataFrame(
        [(1, "new", 2, "annotated")],
        "k bigint, val string, ver int, note string",
    )
    upsert_versioned(spark, path, upd, "k", "ver")  # crashed pre-fix
    latest = {
        r["k"]: (r["val"], r["note"])
        for r in read_versioned(spark, path).collect()
    }
    assert latest[1] == ("new", "annotated")
    assert latest[2] == ("old", None)
    assert len(latest) == 8


def test_racing_writers_never_share_a_data_dir(spark, tmp_path):
    """Round-11 ADVICE (medium): two writers racing to the same version
    number land files in writer-unique dirs, so the winner's manifest
    can never pick up the loser's task files. The loser raises the
    documented ConcurrentWriteError at commit and its orphan dir is
    swept by the next expire_versions."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        ConcurrentWriteError,
        _commit_manifest,
        _new_vdir,
        _read_manifest,
        _write_bucketed,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    # both writers allocate version 2; interleave: loser writes data
    # first, then the winner writes AND commits, then the loser commits
    loser_vdir = _new_vdir(path, 2)
    loser_files = _write_bucketed(
        spark,
        _df(spark, [(99, "loser", 2)]),
        path,
        loser_vdir,
        "k",
        16,
        "parquet",
    )
    winner_vdir = _new_vdir(path, 2)
    assert winner_vdir != loser_vdir
    winner_files = _write_bucketed(
        spark,
        _df(spark, [(2, "winner", 2)]),
        path,
        winner_vdir,
        "k",
        16,
        "parquet",
    )
    # the winner's listing saw only its own dir: no loser rows leak in
    assert {e["path"] for e in winner_files}.isdisjoint(
        {e["path"] for e in loser_files}
    )
    m1 = _read_manifest(spark, path, 1)
    _commit_manifest(
        spark,
        path,
        2,
        {**m1, "version": 2, "files": m1["files"] + winner_files},
    )
    with pytest.raises(ConcurrentWriteError):
        _commit_manifest(
            spark,
            path,
            2,
            {**m1, "version": 2, "files": m1["files"] + loser_files},
        )
    from etl_pipeline_example_spark.pipeline.versioned import _write_pointer

    _write_pointer(spark, path, 2)
    rows = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert rows == {1: "a", 2: "winner"}, rows
    # while version 2 IS the head, the loser's dir is fenced: GC cannot
    # tell a failed loser from one still mid-write, and deleting under
    # an active write would turn the documented ConcurrentWriteError
    # into an FS error
    expire_versions(spark, path, keep=10)
    assert os.path.exists(loser_vdir)
    # the next commit advances the head; now the orphan sweeps
    write_versioned(spark, _df(spark, [(1, "b", 3)]), path)
    expire_versions(spark, path, keep=10)
    assert not os.path.exists(loser_vdir)
    assert os.path.exists(winner_vdir)


def test_crashed_writer_dir_never_blocks_reallocation(spark, tmp_path):
    """Round-11 ADVICE (low): a crash between data write and manifest
    commit leaves an orphan data dir for a version number that the next
    writer re-allocates. Writer-unique dirs mean the retry lands in a
    fresh dir instead of dying on mode('errorifexists')."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _new_vdir,
        _write_bucketed,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    # simulate the crash: data written for version 2, no manifest
    _write_bucketed(
        spark,
        _df(spark, [(50, "ghost", 9)]),
        path,
        _new_vdir(path, 2),
        "k",
        16,
        "parquet",
    )
    # next writer allocates version 2 again — must succeed
    v2 = write_versioned(spark, _df(spark, [(1, "b", 2)]), path)
    assert v2 == 2
    rows = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert rows == {1: "b"}, rows  # the ghost rows are unreferenced


def test_expire_gc_fences_inflight_writer_dirs(spark, tmp_path):
    """Round-11 ADVICE (low): GC must not collect files under a version
    dir NEWER than the committed head — that's a concurrent writer's
    uncommitted output, not an orphan."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _new_vdir,
        _write_bucketed,
    )

    path = str(tmp_path / "tbl")
    for i in range(1, 4):
        write_versioned(spark, _df(spark, [(1, f"v{i}", i)]), path, key="k")
    # an in-flight writer working at head+1 (=4), data written, not yet
    # committed; and a stale orphan at version 2 (<= head, unreferenced)
    inflight_vdir = _new_vdir(path, 4)
    _write_bucketed(
        spark,
        _df(spark, [(7, "inflight", 4)]),
        path,
        inflight_vdir,
        "k",
        16,
        "parquet",
    )
    orphan_vdir = _new_vdir(path, 2)
    _write_bucketed(
        spark,
        _df(spark, [(8, "orphan", 2)]),
        path,
        orphan_vdir,
        "k",
        16,
        "parquet",
    )
    head_vdir = _new_vdir(path, 3)
    _write_bucketed(
        spark,
        _df(spark, [(9, "racing", 3)]),
        path,
        head_vdir,
        "k",
        16,
        "parquet",
    )
    expire_versions(spark, path, keep=2)
    assert os.path.exists(inflight_vdir)  # fenced: newer than head
    assert os.path.exists(head_vdir)  # fenced: a same-version racer
    assert not os.path.exists(orphan_vdir)  # swept: stale orphan


def test_where_pruned_read_opens_a_fraction_of_files(spark, tmp_path):
    """The file-skipping contract (round-11 verdict ask #6): with
    range-clustered files and manifest min/max stats, a selective read
    plans over ~1/K of the files — pinned by DataFrame.inputFiles()
    (the zorder footer-audit precedent) — and still returns exactly
    the filtered rows."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, f"r{k}", 1) for k in range(800)], "k bigint, val string, ver int"
    ).repartitionByRange(8, "k")
    write_versioned(spark, df, path, stats_cols=["k"])
    m = _read_manifest(spark, path, 1)
    assert len(m["files"]) == 8
    assert all("stats" in e and "k" in e["stats"] for e in m["files"])
    full = read_versioned(spark, path)
    assert len(full.inputFiles()) == 8
    pruned = read_versioned(spark, path, where=("k", "=", 123))
    assert len(pruned.inputFiles()) <= 2, pruned.inputFiles()
    assert [(r["k"], r["val"]) for r in pruned.collect()] == [(123, "r123")]
    # a conjunctive range touches only the covering files
    band = read_versioned(
        spark, path, where=[("k", ">=", 100), ("k", "<", 200)]
    )
    assert len(band.inputFiles()) <= 2, band.inputFiles()
    assert band.count() == 100


def test_stats_ride_shared_files_and_recompute_on_rewrite(
    spark, tmp_path
):
    """Upserts keep stats on by-reference files and record fresh bounds
    for rewritten buckets; stats_cols are inherited by later commits."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, "x", 1) for k in range(200)], "k bigint, val string, ver int"
    )
    write_versioned(spark, base, path, key="k", nbuckets=8, stats_cols=["k"])
    upsert_versioned(spark, path, _df(spark, [(3, "NEW", 2)]), "k", "ver")
    m2 = _read_manifest(spark, path, 2)
    assert m2["stats_cols"] == ["k"]
    assert all("stats" in e for e in m2["files"]), m2["files"]
    lo, hi = (
        min(e["stats"]["k"][0] for e in m2["files"]),
        max(e["stats"]["k"][1] for e in m2["files"]),
    )
    assert (lo, hi) == (0, 199)
    # pruning an out-of-range key opens zero files
    assert read_versioned(spark, path, where=("k", ">", 10_000)).count() == 0


def test_where_is_exact_even_without_stats(spark, tmp_path):
    """Predicates on columns with no recorded stats prune nothing but
    still filter rows — pruning is an optimization, never a semantics
    change."""
    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]), path
    )
    got = read_versioned(spark, path, where=("val", ">=", "b")).collect()
    assert sorted(r["k"] for r in got) == [2, 3]
    with pytest.raises(ValueError):
        read_versioned(spark, path, where=("val", "LIKE", "b%"))


def test_where_accepts_tuple_of_triples(spark, tmp_path):
    """A conjunction written as a TUPLE of triples works the same as a
    list of triples (the natural spelling must not unpack-crash)."""
    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(k, "x", 1) for k in range(10)]), path
    )
    got = read_versioned(
        spark, path, where=(("k", ">=", 3), ("k", "<", 6))
    ).collect()
    assert sorted(r["k"] for r in got) == [3, 4, 5]


def test_cluster_by_write_makes_pruning_selective(spark, tmp_path):
    """Round-12 verdict ask #5: write_versioned(cluster_by=) must make
    where= pruning selective BY CONSTRUCTION — an identically-shuffled
    frame written without clustering leaves per-file min/max spanning
    the whole domain, so the same predicate opens (almost) everything."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    rows = [(k, f"r{k}", 1) for k in range(800)]
    # deliberately UNSORTED input: round-robin shuffle scatters the key
    shuffled = spark.createDataFrame(
        rows, "k bigint, val string, ver int"
    ).repartition(8)

    flat = str(tmp_path / "flat")
    write_versioned(spark, shuffled, flat, stats_cols=["k"])
    clustered = str(tmp_path / "clustered")
    write_versioned(
        spark, shuffled, clustered, cluster_by="k", cluster_files=8
    )

    m = _read_manifest(spark, clustered, 1)
    assert m["cluster_by"] == "k"
    assert len(m["files"]) == 8
    # cluster_by auto-enrolls in stats_cols — no separate opt-in needed
    assert all("k" in e.get("stats", {}) for e in m["files"])

    pred = ("k", "=", 123)
    flat_files = read_versioned(spark, flat, where=pred).inputFiles()
    clus = read_versioned(spark, clustered, where=pred)
    assert len(clus.inputFiles()) <= 2, clus.inputFiles()
    # the unclustered layout proves the contrast: nearly every file
    # spans the domain, so stats alone cannot prune it
    assert len(flat_files) >= 6, flat_files
    assert [(r["k"], r["val"]) for r in clus.collect()] == [(123, "r123")]
    band = read_versioned(
        spark, clustered, where=[("k", ">=", 100), ("k", "<", 200)]
    )
    assert len(band.inputFiles()) <= 2, band.inputFiles()
    assert band.count() == 100


def test_cluster_by_is_inherited_and_exclusive_with_key(spark, tmp_path):
    """A later unkeyed commit inherits the clustering (layout contract
    parity with key/nbuckets); cluster_by + key is a ValueError."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(k, "a", 1) for k in range(400)], "k bigint, val string, ver int"
    ).repartition(8)
    write_versioned(spark, df1, path, cluster_by="k", cluster_files=8)
    df2 = spark.createDataFrame(
        [(k, "b", 2) for k in range(400, 800)],
        "k bigint, val string, ver int",
    ).repartition(8)
    write_versioned(spark, df2, path)  # no cluster_by passed
    m2 = _read_manifest(spark, path, 2)
    assert m2["cluster_by"] == "k"
    pruned = read_versioned(spark, path, where=("k", "=", 555))
    assert len(pruned.inputFiles()) <= 2, pruned.inputFiles()
    assert [r["val"] for r in pruned.collect()] == ["b"]

    with pytest.raises(ValueError):
        write_versioned(
            spark, df1, str(tmp_path / "bad"), key="k", cluster_by="k"
        )


def test_expire_grace_window_fences_slow_writer(spark, tmp_path):
    """Round-12 ADVICE: a slow writer whose allocated version falls 2+
    commits behind the advancing head is outside the version fence —
    the mtime grace window must protect its uncommitted files until it
    either commits (ConcurrentWriteError) or ages past the window."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        _new_vdir,
        _write_bucketed,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "v1", 1)]), path, key="k")
    # slow writer allocates version 2 and starts writing...
    slow_vdir = _new_vdir(path, 2)
    _write_bucketed(
        spark,
        _df(spark, [(42, "slow", 2)]),
        path,
        slow_vdir,
        "k",
        16,
        "parquet",
    )
    # ...while two other commits land: head advances to 3, past the
    # slow writer's version — the version fence no longer covers it
    write_versioned(spark, _df(spark, [(1, "v2", 2)]), path)
    write_versioned(spark, _df(spark, [(1, "v3", 3)]), path)
    expire_versions(spark, path, keep=10, grace_ms=10 * 60 * 1000)
    assert os.path.exists(slow_vdir)  # fenced: younger than the window
    expire_versions(spark, path, keep=10)  # grace_ms=0, the old sweep
    assert not os.path.exists(slow_vdir)


def test_bloom_cols_prune_point_lookups_on_unsorted_layout(spark, tmp_path):
    """Min/max stats cannot prune a point lookup when every file spans
    the key domain (the flat-layout contrast in the cluster_by test);
    a per-file bloom can. Same shuffled frame, bloom_cols=['k'] →
    k=123 opens exactly the file(s) holding it."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    rows = [(k, f"r{k}", 1) for k in range(800)]
    shuffled = spark.createDataFrame(
        rows, "k bigint, val string, ver int"
    ).repartition(8)

    path = str(tmp_path / "bloomed")
    write_versioned(
        spark, shuffled, path, stats_cols=["k"], bloom_cols=["k", "val"]
    )
    m = _read_manifest(spark, path, 1)
    n_files = len(m["files"])
    assert n_files >= 6
    assert all(
        set(e.get("bloom", {})) == {"k", "val"} for e in m["files"]
    )

    got = read_versioned(spark, path, where=("k", "=", 123))
    # at 32768 bits / 4 hashes / ~100 keys per file, a false positive
    # admitting a second file has probability ~1e-10 — assert exact
    assert len(got.inputFiles()) == 1, got.inputFiles()
    assert [(r["k"], r["val"]) for r in got.collect()] == [(123, "r123")]
    # string column blooms prune the same way
    got_s = read_versioned(spark, path, where=("val", "=", "r456"))
    assert len(got_s.inputFiles()) == 1, got_s.inputFiles()
    assert got_s.collect()[0]["k"] == 456
    # absent key: every file's bloom proves it out → empty, zero files
    absent = read_versioned(spark, path, where=("k", "=", 100000))
    assert absent.count() == 0
    # range predicates ignore blooms (min/max only) and stay sound
    band = read_versioned(
        spark, path, where=[("k", ">=", 100), ("k", "<", 110)]
    ).collect()
    assert sorted(r["k"] for r in band) == list(range(100, 110))


def test_bloom_cols_inherited_through_upsert(spark, tmp_path):
    """bloom_cols ride the manifest across commits: an upsert rewrites
    only touched buckets, and the rewritten files get FRESH blooms
    that see the new keys."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        _df(spark, [(k, f"r{k}", 1) for k in range(64)]),
        path,
        key="k",
        bloom_cols=["k"],
    )
    upsert_versioned(
        spark, path, _df(spark, [(999, "new", 2)]), "k", "ver"
    )
    m2 = _read_manifest(spark, path, 2)
    assert m2["bloom_cols"] == ["k"]
    assert all("k" in e.get("bloom", {}) for e in m2["files"])
    got = read_versioned(spark, path, where=("k", "=", 999))
    assert [r["val"] for r in got.collect()] == ["new"]
    # the new key lives in exactly one bucket file
    assert len(got.inputFiles()) == 1, got.inputFiles()


def test_bloom_ignores_type_mismatched_probes(spark, tmp_path):
    """A float probe against a bigint bloom column renders '7.0' on
    the probe side vs '7' on the build side — the bloom must NOT be
    consulted (review finding: it silently pruned every file), and the
    row filter still matches."""
    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        spark.createDataFrame(
            [(k, f"r{k}", 1) for k in range(100)],
            "k bigint, val string, ver int",
        ).repartition(4),
        path,
        bloom_cols=["k"],
    )
    got = read_versioned(spark, path, where=("k", "=", 7.0)).collect()
    assert [(r["k"], r["val"]) for r in got] == [(7, "r7")]
    # the exact-typed probe still prunes
    typed = read_versioned(spark, path, where=("k", "=", 7))
    assert len(typed.inputFiles()) <= 2


def test_cluster_by_on_inherited_keyed_table_raises(spark, tmp_path):
    """Review finding: cluster_by on a table whose layout is inherited
    hash-bucketed silently took the keyed branch while the manifest
    recorded a clustering that never happened — now it raises."""
    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    with pytest.raises(ValueError, match="inherited layout is"):
        write_versioned(
            spark, _df(spark, [(2, "b", 1)]), path, cluster_by="ver"
        )


def test_compact_preserves_cluster_layout(spark, tmp_path):
    """Review finding: bucket-granular compaction merged every sorted
    stripe (all bucket 0) into ONE file, destroying the disjoint
    min/max stripes while the manifest still claimed cluster_by. Now:
    a tidy clustered table is a metadata no-op, and cluster_files is
    persisted + inherited so later commits keep the granularity."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        compact_versioned,
    )

    rows = [(k, f"r{k}", 1) for k in range(800)]
    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        spark.createDataFrame(
            rows, "k bigint, val string, ver int"
        ).repartition(8),
        path,
        cluster_by="k",
        cluster_files=8,
    )
    # tidy table: compaction must NOT collapse the stripes
    v = compact_versioned(spark, path)
    assert v == 1  # no-op, no new version
    m = _read_manifest(spark, path, 1)
    assert len(m["files"]) == 8 and m["cluster_files"] == 8
    pruned = read_versioned(spark, path, where=("k", "=", 123))
    assert len(pruned.inputFiles()) <= 2
    # a later unkeyed commit inherits BOTH cluster_by and cluster_files
    write_versioned(
        spark,
        spark.createDataFrame(
            rows, "k bigint, val string, ver int"
        ).repartition(8),
        path,
    )
    m2 = _read_manifest(spark, path, 2)
    assert m2["cluster_by"] == "k" and m2["cluster_files"] == 8
    assert len(m2["files"]) == 8


def test_compact_format_override_converts_all_files(spark, tmp_path):
    """Round-14 review fixes: compact_versioned(data_format=...) must
    (a) record the NEW format in the committed manifest and (b) rewrite
    every file — a kept-by-reference file in the old format under a
    manifest claiming the new one would misparse on read."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        compact_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    # second commit so one bucket holds two files and another holds one
    upsert_versioned(
        spark, path, _df(spark, [(1, "A", 2), (2, "b", 2)]), "k", "ver"
    )
    v = compact_versioned(spark, path, data_format="orc")
    m = _read_manifest(spark, path, v)
    assert m["format"] == "orc"
    # every file was rewritten in the new format (no old-format keeps)
    assert all(f"v={v:06d}" in e["path"] for e in m["files"]), m["files"]
    got = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert got == {1: "A", 2: "b"}
    # clustered branch: format override also lands in the manifest
    cpath = str(tmp_path / "ctbl")
    rows = [(k, f"r{k}", 1) for k in range(100)]
    write_versioned(
        spark,
        spark.createDataFrame(rows, "k bigint, val string, ver int"),
        cpath,
        cluster_by="k",
        cluster_files=4,
    )
    cv = compact_versioned(spark, cpath, data_format="orc")
    cm = _read_manifest(spark, cpath, cv)
    assert cv == 2 and cm["format"] == "orc"
    assert read_versioned(spark, cpath).count() == 100


def test_cluster_files_explicit_overrides_inherited(spark, tmp_path):
    """Round-14 review fix: an unkeyed commit that inherits cluster_by
    may still pass an explicit cluster_files to change the stripe
    granularity (None is the not-passed sentinel; the previous code
    clobbered the explicit value with the inherited one)."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
    )

    rows = [(k, f"r{k}", 1) for k in range(800)]
    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        spark.createDataFrame(rows, "k bigint, val string, ver int"),
        path,
        cluster_by="k",
        cluster_files=8,
    )
    # re-stripe WITHOUT re-passing cluster_by
    write_versioned(
        spark,
        spark.createDataFrame(rows, "k bigint, val string, ver int"),
        path,
        cluster_files=4,
    )
    m2 = _read_manifest(spark, path, 2)
    assert m2["cluster_by"] == "k" and m2["cluster_files"] == 4
    assert len(m2["files"]) == 4


def test_bloom_cols_bad_column_raises(spark, tmp_path):
    """Round-14 review fix: a misspelled or non-bloomable bloom column
    raises instead of silently recording a bloom that never prunes."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 1.5)], "k bigint, val string, score double"
    )
    with pytest.raises(ValueError, match="bloom_cols"):
        write_versioned(spark, df, path, bloom_cols=["kk"])  # misspelled
    with pytest.raises(ValueError, match="bloom_cols"):
        write_versioned(spark, df, path, bloom_cols=["score"])  # double
    # valid columns still work
    write_versioned(spark, df, str(tmp_path / "ok"), bloom_cols=["k", "val"])


def test_timestamp_time_travel(spark, tmp_path):
    """read_versioned(as_of_ms=...) resolves the newest version
    committed at or before the stamp (Delta TIMESTAMP AS OF)."""
    import time as _time

    from etl_pipeline_example_spark.pipeline.versioned import (
        resolve_version_asof,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path, key="k")
    t1 = int(_time.time() * 1000)
    _time.sleep(0.05)
    upsert_versioned(spark, path, _df(spark, [(1, "A", 2)]), "k", "ver")
    assert resolve_version_asof(spark, path, t1) == 1
    old = read_versioned(spark, path, as_of_ms=t1).collect()
    assert [(r["k"], r["val"]) for r in old] == [(1, "a")]
    now = read_versioned(
        spark, path, as_of_ms=int(_time.time() * 1000)
    ).collect()
    assert [(r["k"], r["val"]) for r in now] == [(1, "A")]
    with pytest.raises(ValueError, match="no version"):
        resolve_version_asof(spark, path, t1 - 10 * 365 * 86400 * 1000)
    with pytest.raises(ValueError, match="not both"):
        read_versioned(spark, path, version=1, as_of_ms=t1)


def test_shallow_clone_zero_copy_then_cow_divergence(spark, tmp_path):
    """clone_versioned references the source's files byte-free; an
    upsert into the clone rewrites only its own buckets and the source
    never changes."""
    import os

    from etl_pipeline_example_spark.pipeline.versioned import (
        clone_versioned,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    write_versioned(
        spark, _df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]),
        src, key="k",
    )
    v = clone_versioned(spark, src, dst)
    assert v == 1
    # zero copy: the clone dir holds no data files at all yet
    clone_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(dst)
        for f in fs
        if not f.startswith("_") and "manifest" not in r
    ]
    assert all("data" not in p for p in clone_files), clone_files
    got = {r["k"]: r["val"] for r in read_versioned(spark, dst).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # diverge the clone; source untouched
    upsert_versioned(spark, dst, _df(spark, [(2, "X", 2)]), "k", "ver")
    assert {
        r["k"]: r["val"] for r in read_versioned(spark, dst).collect()
    } == {1: "a", 2: "X", 3: "c"}
    assert {
        r["k"]: r["val"] for r in read_versioned(spark, src).collect()
    } == {1: "a", 2: "b", 3: "c"}
    # compacting the clone materializes every byte into its own dirs,
    # cutting the dependency on source files
    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        compact_versioned,
    )

    cv = compact_versioned(spark, dst)
    m = _read_manifest(spark, dst, cv)
    assert all(not e["path"].startswith(src) for e in m["files"]), m["files"]
    assert {
        r["k"]: r["val"] for r in read_versioned(spark, dst).collect()
    } == {1: "a", 2: "X", 3: "c"}
    # cloning onto an existing table refuses
    with pytest.raises(ValueError, match="already"):
        clone_versioned(spark, src, dst)


def test_rename_free_commit_survives_torn_and_stale_pointer(spark, tmp_path):
    """Round-15: the commit protocol is rename-free (object stores turn
    rename into a non-atomic copy+delete). The manifest create IS the
    commit; the pointer is a best-effort hint. Simulate every botched
    pointer state a non-atomic overwrite can produce and prove readers
    AND writers still resolve the newest committed manifest."""
    import os

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path)
    upsert_versioned(spark, path, _df(spark, [(1, "b", 2)]), "k", "ver")
    ptr = os.path.join(path, "_latest")
    # torn mid-overwrite: empty file
    with open(ptr, "w"):
        pass
    assert read_versioned(spark, path).collect()[0]["val"] == "b"
    # torn mid-overwrite: garbage bytes
    with open(ptr, "wb") as f:
        f.write(b"\x00ga rbage")
    assert read_versioned(spark, path).collect()[0]["val"] == "b"
    # STALE: crash between manifest commit and pointer PUT left the
    # pointer at v1 while v2 is committed — the newer manifest must win
    # for readers, and an upsert must merge against v2 (not silently
    # drop v2's rows by merging against the stale head)
    with open(ptr, "w") as f:
        f.write("1\n")
    assert read_versioned(spark, path).collect()[0]["val"] == "b"
    v3 = upsert_versioned(spark, path, _df(spark, [(2, "c", 3)]), "k", "ver")
    assert v3 == 3
    got = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert got == {1: "b", 2: "c"}, got
    # no tmp-pointer or staged-rename artifacts anywhere in the table
    # (._latest.crc is the local-FS checksum sidecar, not an artifact)
    names = set(os.listdir(path))
    assert ".%s.tmp" % "_latest" not in names, names


def test_no_rename_in_versioned_commit_path():
    """The versioned layer must never call a filesystem rename: object
    stores implement it as copy+delete and every crash window in
    between is a torn table someone ships. Pin it at the source level
    so a regression is loud."""
    import inspect

    import etl_pipeline_example_spark.pipeline.versioned as versioned

    src = inspect.getsource(versioned)
    assert ".rename(" not in src, "rename crept back into the commit path"
    assert "FileContext" not in src


def test_committed_at_ms_monotonic_under_clock_skew(spark, tmp_path, monkeypatch):
    """Round-14 ADVICE (low): wall-clock skew between writers could
    stamp version N+1 earlier than N, making as-of resolution return
    the newer version for a timestamp predating its real commit. The
    stamp now clamps to prev+1 (the Delta in-commit-timestamp rule)."""
    import time as _time

    from etl_pipeline_example_spark.pipeline.versioned import (
        _read_manifest,
        resolve_version_asof,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path)
    s1 = _read_manifest(spark, path, 1)["committed_at_ms"]
    # second writer's clock is an hour BEHIND
    real = _time.time
    monkeypatch.setattr(
        "etl_pipeline_example_spark.pipeline.versioned.time.time",
        lambda: real() - 3600,
    )
    upsert_versioned(spark, path, _df(spark, [(1, "b", 2)]), "k", "ver")
    s2 = _read_manifest(spark, path, 2)["committed_at_ms"]
    assert s2 == s1 + 1, (s1, s2)  # clamped, strictly increasing
    # as-of at v1's stamp resolves v1, never the skewed v2
    assert resolve_version_asof(spark, path, s1) == 1
    assert resolve_version_asof(spark, path, s2) == 2
