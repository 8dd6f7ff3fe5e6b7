"""Unit tests for the MERGE engine (SURVEY §5: insert-only, update-only,
mixed, no-op suppression via null-safe compare, dup-in-batch keep-latest,
and the materialized write path)."""

from __future__ import annotations

import datetime as dt

import pytest

from the_movies_db_spark.upsert import (
    changed_predicate,
    keep_latest,
    merge_upsert,
    with_audit_column,
    write_upsert,
)

SCHEMA = "id long, val string, record_loaded_at timestamp"
T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _as_map(df):
    return {r.id: r for r in df.collect()}


def test_insert_only(spark):
    target = _df(spark, [(1, "a", T0)])
    batch = _df(spark, [(2, "b", T1)])
    out = _as_map(merge_upsert(target, batch, "id"))
    assert set(out) == {1, 2}
    assert out[2].val == "b"


def test_update_only(spark):
    target = _df(spark, [(1, "a", T0)])
    batch = _df(spark, [(1, "A", T1)])
    out = _as_map(merge_upsert(target, batch, "id"))
    assert out[1].val == "A"
    assert out[1].record_loaded_at == T1


def test_noop_keeps_target_row_and_audit(spark):
    target = _df(spark, [(1, "a", T0)])
    batch = _df(spark, [(1, "a", T1)])  # same value, newer audit
    out = _as_map(merge_upsert(target, batch, "id"))
    # change detection excludes the audit column → no-op → old audit kept
    assert out[1].record_loaded_at == T0


def test_null_safe_change_detection(spark):
    target = _df(spark, [(1, None, T0), (2, "x", T0), (3, None, T0)])
    batch = _df(spark, [(1, "now-set", T1), (2, None, T1), (3, None, T1)])
    out = _as_map(merge_upsert(target, batch, "id"))
    assert out[1].val == "now-set" and out[1].record_loaded_at == T1  # NULL→value
    assert out[2].val is None and out[2].record_loaded_at == T1  # value→NULL
    assert out[3].val is None and out[3].record_loaded_at == T0  # NULL=NULL no-op


def test_mixed_and_target_retention(spark):
    target = _df(spark, [(1, "a", T0), (2, "b", T0)])
    batch = _df(spark, [(2, "B", T1), (3, "c", T1)])
    out = _as_map(merge_upsert(target, batch, "id"))
    assert out[1].val == "a" and out[2].val == "B" and out[3].val == "c"


def test_in_batch_duplicates_keep_latest(spark):
    target = _df(spark, [(1, "a", T0)])
    batch = _df(spark, [(1, "older", T0), (1, "newer", T1)])
    out = _as_map(merge_upsert(target, batch, "id"))
    assert out[1].val == "newer"


def test_keep_latest_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "x", "v1", T0), (1, "x", "v2", T1), (1, "y", "w1", T0)],
        "k1 long, k2 string, val string, record_loaded_at timestamp",
    )
    out = keep_latest(df, ["k1", "k2"], "record_loaded_at")
    vals = {(r.k1, r.k2): r.val for r in out.collect()}
    assert vals == {(1, "x"): "v2", (1, "y"): "w1"}


def test_changed_predicate_excludes_audit(spark):
    t = _df(spark, [(1, "a", T0)]).alias("t")
    b = _df(spark, [(1, "a", T1)]).alias("b")
    joined = t.join(b, "id")
    n = joined.filter(
        changed_predicate("t", "b", ["val", "record_loaded_at"])
    ).count()
    assert n == 0


def test_with_audit_column(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = with_audit_column(df)
    assert "record_loaded_at" in out.columns
    assert out.first().record_loaded_at is not None


def test_write_upsert_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_upsert(spark, path, _df(spark, [(1, "a", T0), (2, "b", T0)]), "id")
    write_upsert(spark, path, _df(spark, [(2, "B", T1), (3, "c", T1)]), "id")
    from the_movies_db_spark.upsert import read_table

    out = _as_map(read_table(spark, path))
    assert {k: v.val for k, v in out.items()} == {1: "a", 2: "B", 3: "c"}


def test_merge_upsert_schema_evolution_inline(spark):
    target = spark.createDataFrame([(1, "a")], "id long, val string")
    batch = spark.createDataFrame(
        [(1, "a", 9.5), (2, "b", 1.0)], "id long, val string, score double"
    )
    out = merge_upsert(target, batch, "id", order_col=None)
    rows = _as_map(out)
    assert set(out.columns) == {"id", "val", "score"}
    # row 1: score differs (NULL vs 9.5) → batch wins
    assert rows[1].score == 9.5 and rows[2].score == 1.0


@pytest.mark.parametrize("n", [0])
def test_empty_batch_is_identity(spark, n):
    target = _df(spark, [(1, "a", T0)])
    batch = _df(spark, []).limit(n)
    out = _as_map(merge_upsert(target, batch, "id"))
    assert out[1].val == "a"


def test_write_upsert_partitioned_prunes(spark, tmp_path):
    from the_movies_db_spark.upsert import write_upsert_partitioned

    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01", 1), (2, "b", "2024-01-01", 1),
         (3, "c", "2024-01-02", 1), (4, "d", "2024-01-03", 1)],
        "pk long, v string, day string, ver int",
    )
    write_upsert_partitioned(spark, path, base, "pk", "day", order_col="ver")

    import os
    sig_before = {
        d: sorted(os.listdir(f"{path}/{d}"))
        for d in os.listdir(path) if d.startswith("day=")
    }

    # batch touches only 2024-01-01: update pk=2, insert pk=5
    batch = spark.createDataFrame(
        [(2, "B2", "2024-01-01", 2), (5, "e", "2024-01-01", 2)],
        "pk long, v string, day string, ver int",
    )
    touched = write_upsert_partitioned(spark, path, batch, "pk", "day", order_col="ver")
    assert touched == ["2024-01-01"]

    got = {r.pk: (r.v, str(r.day)) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", "2024-01-01"), 2: ("B2", "2024-01-01"), 5: ("e", "2024-01-01"),
        3: ("c", "2024-01-02"), 4: ("d", "2024-01-03"),
    }
    # untouched partition directories were not rewritten
    sig_after = {
        d: sorted(os.listdir(f"{path}/{d}"))
        for d in os.listdir(path) if d.startswith("day=")
    }
    assert sig_after["day=2024-01-02"] == sig_before["day=2024-01-02"]
    assert sig_after["day=2024-01-03"] == sig_before["day=2024-01-03"]
    assert sig_after["day=2024-01-01"] != sig_before["day=2024-01-01"]


def test_merge_upsert_empty_batch_is_identity(spark):
    from the_movies_db_spark.upsert import merge_upsert

    t = spark.createDataFrame([(1, "a"), (2, "b")], "pk long, v string")
    empty = spark.createDataFrame([], "pk long, v string")
    out = merge_upsert(t, empty, "pk", order_col=None, audit_col="__none__")
    assert sorted(map(tuple, out.collect())) == [(1, "a"), (2, "b")]


def test_merge_upsert_into_empty_target(spark):
    from the_movies_db_spark.upsert import merge_upsert

    empty = spark.createDataFrame([], "pk long, v string")
    b = spark.createDataFrame([(1, "a")], "pk long, v string")
    out = merge_upsert(empty, b, "pk", order_col=None, audit_col="__none__")
    assert [tuple(r) for r in out.collect()] == [(1, "a")]


def test_scd2_upsert_versions(spark):
    from datetime import datetime

    from the_movies_db_spark.upsert import scd2_upsert

    ts0, ts1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    target = spark.createDataFrame(
        [(1, "a", ts0, None), (2, "b", ts0, None)],
        "pk long, v string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame(
        [(1, "A", ts1), (3, "c", ts1)],  # pk1 changes, pk3 is new, pk2 untouched
        "pk long, v string, ts timestamp",
    )
    out = scd2_upsert(target, batch, "pk", "ts")
    rows = {(r.pk, r.v): (r.valid_from, r.valid_to) for r in out.collect()}
    assert rows[(1, "a")] == (ts0, ts1)     # old version closed at batch ts
    assert rows[(1, "A")] == (ts1, None)    # new current version
    assert rows[(2, "b")] == (ts0, None)    # untouched stays open
    assert rows[(3, "c")] == (ts1, None)    # brand-new key
    assert out.count() == 4
    # re-applying the same batch is a no-op (idempotent)
    again = scd2_upsert(out, batch, "pk", "ts")
    assert again.count() == 4


def test_write_upsert_crash_before_commit_keeps_old_version(spark, tmp_path):
    """Manifest-guarded swap: a crash after the new version dir is fully
    written but BEFORE the pointer flip must leave the previous version
    readable, and a retry must converge to the merged state."""
    from the_movies_db_spark import upsert as U

    path = str(tmp_path / "tbl")
    U.write_upsert(spark, path, _df(spark, [(1, "a", T0), (2, "b", T0)]), "id")
    before = {k: v.val for k, v in _as_map(U.read_table(spark, path)).items()}
    assert before == {1: "a", 2: "b"}

    def crash():
        raise RuntimeError("simulated crash before pointer flip")

    U._before_pointer_flip = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            U.write_upsert(spark, path, _df(spark, [(2, "B", T1)]), "id")
    finally:
        U._before_pointer_flip = None

    # table still serves the pre-crash version
    after_crash = {k: v.val for k, v in _as_map(U.read_table(spark, path)).items()}
    assert after_crash == before

    # retry commits; the orphaned version dir from the crash is ignored
    U.write_upsert(spark, path, _df(spark, [(2, "B", T1), (3, "c", T1)]), "id")
    final = {k: v.val for k, v in _as_map(U.read_table(spark, path)).items()}
    assert final == {1: "a", 2: "B", 3: "c"}


def test_vacuum_keeps_current_version(spark, tmp_path):
    import os

    from the_movies_db_spark import upsert as U

    path = str(tmp_path / "tbl")
    for i in range(3):
        stamp = T0 + dt.timedelta(days=i)
        U.write_upsert(spark, path, _df(spark, [(1, f"v{i}", stamp)]), "id")
    versions = [d for d in os.listdir(path) if U._VERSION_RE.fullmatch(d)]
    assert versions == [U._current_version(path)]  # keep=1 vacuumed the rest
    assert _as_map(U.read_table(spark, path))[1].val == "v2"


def test_time_travel_reads_and_retention(spark, tmp_path):
    """keep_versions=2 retains the previous version after a second
    commit: version-addressed reads return the OLD data unchanged,
    default reads follow _CURRENT, unknown versions raise, and the
    default retention (1) vacuums history."""
    import pytest

    from the_movies_db_spark.upsert import list_versions, read_table, write_upsert

    tbl = str(tmp_path / "tt")
    v1_rows = [(1, "a"), (2, "b")]
    v2_rows = [(2, "B"), (3, "c")]
    df = lambda rows: spark.createDataFrame(rows, "k long, v string")  # noqa: E731
    write_upsert(spark, tbl, df(v1_rows), "k", order_col=None, keep_versions=2)
    write_upsert(spark, tbl, df(v2_rows), "k", order_col=None, keep_versions=2)
    versions = list_versions(tbl)
    assert len(versions) == 2
    old = {(r.k, r.v) for r in read_table(spark, tbl, version=versions[0]).collect()}
    cur = {(r.k, r.v) for r in read_table(spark, tbl).collect()}
    assert old == set(v1_rows)
    assert cur == {(1, "a"), (2, "B"), (3, "c")}
    with pytest.raises(FileNotFoundError):
        read_table(spark, tbl, version="v99999999")
    # default retention: third commit with keep_versions=1 drops history
    write_upsert(spark, tbl, df([(4, "d")]), "k", order_col=None)
    assert len(list_versions(tbl)) == 1


# --- single-writer lease (concurrent-writer contract) ----------------------


def test_writer_lock_excludes_concurrent_writer(spark, tmp_path):
    import the_movies_db_spark.upsert as U

    root = str(tmp_path / "tbl")
    write_upsert(spark, root, _df(spark, [(1, "a", T0)]), "id")
    before = U._current_version(root)
    with U.writer_lock(root):
        with pytest.raises(U.WriterLockError):
            write_upsert(spark, root, _df(spark, [(2, "b", T1)]), "id")
    # pointer untouched and still valid
    assert U._current_version(root) == before
    assert _as_map(U.read_table(spark, root)).keys() == {1}


def test_writer_lock_stale_lease_is_stolen(spark, tmp_path):
    """A holder that crashed (lease file left behind, past its lease)
    must not wedge the table forever: the next writer steals the lease
    CAS-style and commits."""
    import os

    import the_movies_db_spark.upsert as U

    root = str(tmp_path / "tbl")
    write_upsert(spark, root, _df(spark, [(1, "a", T0)]), "id")
    lock = os.path.join(root, U.WRITER_LOCK)
    with open(lock, "w") as fh:  # simulated crashed holder
        fh.write("99999 0\n")
    os.utime(lock, (0, 0))  # ancient mtime -> stale
    write_upsert(spark, root, _df(spark, [(2, "b", T1)]), "id")
    assert _as_map(U.read_table(spark, root)).keys() == {1, 2}
    assert not os.path.exists(lock)


def test_racing_writers_serialize_without_lost_update(spark, tmp_path):
    """Two writers racing with lock_wait > 0 must SERIALIZE: both
    batches land (no lost update), _CURRENT always points at a
    complete readable version (no torn pointer)."""
    import threading

    import the_movies_db_spark.upsert as U

    root = str(tmp_path / "tbl")
    write_upsert(spark, root, _df(spark, [(0, "base", T0)]), "id")
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            write_upsert(
                spark, root,
                _df(spark, [(i, f"w{i}", T1)]), "id",
                keep_versions=10, lock_wait=60.0,
            )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert _as_map(U.read_table(spark, root)).keys() == {0, 1, 2}
    # pointer names a complete, readable version dir
    cur = U._current_version(root)
    assert cur in U.list_versions(root)


def test_crash_mid_write_leaves_valid_pointer_and_stale_lease_recovers(
    spark, tmp_path
):
    """Full crash-injection cycle: writer dies between data write and
    pointer flip (lease held at death, since a real crash cannot run
    the release) -> table still reads the old version; a later writer
    steals the expired lease and commits normally."""
    import os

    import the_movies_db_spark.upsert as U

    root = str(tmp_path / "tbl")
    write_upsert(spark, root, _df(spark, [(1, "a", T0)]), "id")
    before = U._current_version(root)

    class Died(RuntimeError):
        pass

    def crash():
        # re-create the lease as a crashed process would leave it: the
        # exception path releases it, so pin a copy back afterwards
        raise Died()

    U._before_pointer_flip = crash
    try:
        with pytest.raises(Died):
            write_upsert(spark, root, _df(spark, [(2, "b", T1)]), "id")
    finally:
        U._before_pointer_flip = None
    # old version still current and readable
    assert U._current_version(root) == before
    assert _as_map(U.read_table(spark, root)).keys() == {1}
    # simulate the lease the dead process would have left, already stale
    lock = os.path.join(root, U.WRITER_LOCK)
    with open(lock, "w") as fh:
        fh.write("dead 0\n")
    os.utime(lock, (0, 0))
    write_upsert(spark, root, _df(spark, [(3, "c", T1)]), "id")
    assert _as_map(U.read_table(spark, root)).keys() == {1, 3}


def test_delete_keys_rejects_partitioned_layout(spark, tmp_path):
    """delete_keys assumes the flat versioned-dir layout and the
    INTERNAL writer lease; calling it on a write_upsert_partitioned
    table (external sibling lock, flat partition dirs, no _CURRENT
    pointer) must be rejected up front — committing a version dir into
    the flat root would silently change the table layout."""
    import pytest

    from the_movies_db_spark.upsert import delete_keys, write_upsert_partitioned

    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01", 1), (2, "b", "2024-01-02", 1)],
        "pk long, v string, day string, ver int",
    )
    write_upsert_partitioned(spark, path, base, "pk", "day", order_col="ver")
    doomed = spark.createDataFrame([(1,)], "pk long")
    with pytest.raises(ValueError, match="flat versioned-dir"):
        delete_keys(spark, path, doomed, "pk")


def test_write_audit_publish_null_predicate_quarantines(spark, tmp_path):
    """A NULL audit predicate must quarantine the row, never silently
    drop it: quarantine takes `pred IS NOT FALSE`, publish takes the
    exact complement, and n_published counts the published files."""
    from the_movies_db_spark import upsert as U
    from the_movies_db_spark.upsert import write_audit_publish

    root = str(tmp_path / "wap")
    df = spark.createDataFrame(
        [(1, 100), (2, -5), (3, None)], "id long, cents long"
    )
    res = write_audit_publish(spark, df, root, "cents <= 0")
    assert res["n_staged"] == 3
    # id=2 (bad) AND id=3 (NULL predicate) are quarantined
    assert res["n_bad"] == 2
    assert res["n_published"] == 1
    assert not res["audit_passed"]
    published = {r.id for r in U.read_table(spark, root).collect()}
    assert published == {1}
    qdir = f"{root}/_quarantine/{res['staged_version']}"
    quarantined = {r.id for r in spark.read.parquet(qdir).collect()}
    assert quarantined == {2, 3}


def test_merge_on_read_lifecycle(spark, tmp_path):
    """MOR: O(delta) appends, latest-op-wins reads (delete, update,
    insert, resurrect), compaction folds logs and preserves the view."""
    from the_movies_db_spark.upsert import (
        append_mor_delta,
        compact_mor,
        read_mor,
        write_mor_base,
    )

    root = str(tmp_path / "mor")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pk long, v string"
    )
    write_mor_base(base, root)
    assert {tuple(r) for r in read_mor(spark, root, "pk").collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # delta 1: update 1, delete 2, insert 4
    d1 = spark.createDataFrame(
        [(1, "U", "a2"), (2, "D", None), (4, "U", "d")],
        "pk long, __op string, v string",
    ).select("pk", "__op", "v")
    append_mor_delta(spark, root, d1)
    assert {tuple(r) for r in read_mor(spark, root, "pk").collect()} == {
        (1, "a2"), (3, "c"), (4, "d"),
    }
    # delta 2: resurrect 2, delete 4 — latest seq wins over delta 1
    d2 = spark.createDataFrame(
        [(2, "U", "b2"), (4, "D", None)], "pk long, __op string, v string"
    )
    append_mor_delta(spark, root, d2)
    expected = {(1, "a2"), (2, "b2"), (3, "c")}
    assert {tuple(r) for r in read_mor(spark, root, "pk").collect()} == expected
    # compaction folds both logs; the merged view is unchanged
    assert compact_mor(spark, root, "pk") == 2
    import glob as g
    import os

    assert not g.glob(os.path.join(root, "deltas", "delta-*.parquet"))
    assert {tuple(r) for r in read_mor(spark, root, "pk").collect()} == expected


# ---------------------------------------------------------------- branches


def test_branch_lifecycle_three_way_merge(spark, tmp_path):
    """Planted lifecycle: fork-by-reference read, vacuum protection of
    the fork version, divergent writes, branch-wins three-way merge
    with exact hand-computed final state and stats, branch consumed."""
    import os

    from the_movies_db_spark import upsert as U

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "pk long, s string, v long"
    )
    U.write_upsert(spark, root, df, "pk", order_col=None)
    fork = U.branch_create(root, "dev")
    # by-reference: no version dirs under the branch root yet
    broot = os.path.join(root, "_branches", "dev")
    assert U.list_versions(broot) == []
    assert sorted(
        (r.pk, r.s, r.v) for r in U.read_branch(spark, root, "dev").collect()
    ) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # main diverges: update pk=1 (conflict-to-be), insert pk=4
    U.write_upsert(
        spark, root,
        spark.createDataFrame([(1, "a", 11), (4, "d", 40)],
                              "pk long, s string, v long"),
        "pk", order_col=None,
    )
    # vacuum (keep=1) ran, but the fork version must survive
    assert fork in U.list_versions(root)
    # branch diverges: update pk=1 (conflict) + pk=2, insert pk=5
    U.write_upsert_branch(
        spark, root, "dev",
        spark.createDataFrame([(1, "a", 111), (2, "b", 222), (5, "e", 50)],
                              "pk long, s string, v long"),
        "pk",
    )
    stats = U.merge_branch(spark, root, "dev", "pk")
    assert stats["n_branch_changes"] == 3  # pk 1, 2, 5
    assert stats["n_main_changes"] == 2    # pk 1, 4
    assert stats["n_conflicts"] == 1       # pk 1
    got = sorted(
        (r.pk, r.s, r.v) for r in U.read_table(spark, root).collect()
    )
    assert got == [
        (1, "a", 111),  # conflict: branch wins
        (2, "b", 222),  # branch update
        (3, "c", 30),   # base row persists
        (4, "d", 40),   # main insert survives the merge
        (5, "e", 50),   # branch insert
    ]
    assert U.list_branches(root) == []  # consumed
    # fork no longer referenced: the next write's vacuum removes it
    U.write_upsert(
        spark, root,
        spark.createDataFrame([(6, "f", 60)], "pk long, s string, v long"),
        "pk", order_col=None,
    )
    assert fork not in U.list_versions(root)


def test_branch_merge_error_policy(spark, tmp_path):
    import pytest as _pytest

    from the_movies_db_spark import upsert as U

    root = str(tmp_path / "t2")
    U.write_upsert(
        spark, root,
        spark.createDataFrame([(1, 10)], "pk long, v long"),
        "pk", order_col=None,
    )
    U.branch_create(root, "dev")
    U.write_upsert(
        spark, root, spark.createDataFrame([(1, 11)], "pk long, v long"),
        "pk", order_col=None,
    )
    U.write_upsert_branch(
        spark, root, "dev",
        spark.createDataFrame([(1, 12)], "pk long, v long"), "pk",
    )
    with _pytest.raises(ValueError, match="1 conflicts"):
        U.merge_branch(spark, root, "dev", "pk", on_conflict="error")
    # branch untouched by the failed merge
    assert U.list_branches(root) == ["dev"]
