"""Snapshot table format: atomic commits, time travel, conflicts,
crash invisibility, vacuum, and snapshot-checkpoint pipeline resume."""

import os

import pytest

from pyspark.sql import functions as F


def _mk(spark, tmp_path, name="t"):
    from soda_core_spark.sources.snapshots import SnapshotTable

    return SnapshotTable(spark, str(tmp_path / name))


def _web(spark, n, seed):
    from soda_core_spark.sources.webtext_gen import generate_web_pages

    pdf = generate_web_pages(n, seed=seed)
    for c in ("url", "text", "lang"):
        pdf[c] = pdf[c].astype(object)
    return spark.createDataFrame(pdf)


def test_append_read_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.current_snapshot_id() is None
    s1 = t.append(spark.range(3).select(F.col("id")))
    s2 = t.append(spark.range(3, 5).select(F.col("id")))
    assert (s1, s2) == (1, 2)
    assert t.read().count() == 5
    assert sorted(r["id"] for r in t.read(snapshot_id=s1).collect()) == [0, 1, 2]
    ops = [s.operation for s in t.snapshots()]
    assert ops == ["append", "append"]


def test_overwrite_and_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s1 = t.append(spark.range(4))
    s2 = t.overwrite(spark.range(100, 102))
    assert t.read().count() == 2
    assert t.read(snapshot_id=s1).count() == 4  # old files still readable
    t.rollback(s1)
    assert t.read().count() == 4
    assert t.current_snapshot_id() == s1
    with pytest.raises(Exception):
        t.rollback(999)
    # s2's files are now orphaned off the committed chain → vacuumable
    removed = t.vacuum()
    assert removed, "overwrite files should be swept after rollback"
    assert t.read().count() == 4  # live files untouched


def test_commit_conflict(spark, tmp_path):
    from soda_core_spark.sources.snapshots import CommitConflict

    t = _mk(spark, tmp_path)
    t.append(spark.range(2))
    txn = t.new_append()  # captures parent = 1
    txn.write(spark.range(10, 12))
    t.append(spark.range(5, 7))  # concurrent writer lands first
    with pytest.raises(CommitConflict):
        txn.commit()
    # loser's rows never became visible
    assert t.read().count() == 4
    # and its files are sweepable
    assert t.vacuum()


def test_crash_leftovers_invisible(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.range(3))
    # simulate a writer that crashed after its data write, before commit
    t._write_data(spark.range(1000, 1010))
    assert t.read().count() == 3  # readers use manifests, not listings
    removed = t.vacuum()
    assert len(removed) >= 1
    assert t.read().count() == 3


def test_empty_table_read_raises(spark, tmp_path):
    from soda_core_spark.sources.snapshots import NoSuchSnapshot

    t = _mk(spark, tmp_path)
    with pytest.raises(NoSuchSnapshot):
        t.read()


def test_pipeline_snapshot_resume(spark, tmp_path):
    """End-to-end: resumable run commits one snapshot per bucket; a
    second invocation adds nothing; the union of bucket outputs equals
    the single-pass keep set."""
    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.checkpoint import run_resumable_snapshots

    web = _web(spark, 400, seed=7)
    pipe = QualityFilterPipeline()
    t = _mk(spark, tmp_path, "out")

    states = run_resumable_snapshots(pipe, web, t, n_buckets=4)
    assert [s.bucket for s in states] == [0, 1, 2, 3]
    assert sum(s.n_docs for s in states) == 400
    n_snaps = len(t.snapshots())
    assert n_snaps == 4

    # resume: everything already done → no new snapshots, same states
    states2 = run_resumable_snapshots(pipe, web, t, n_buckets=4)
    assert len(t.snapshots()) == n_snaps
    assert [(s.bucket, s.n_docs, s.n_kept) for s in states2] == [
        (s.bucket, s.n_docs, s.n_kept) for s in states
    ]

    # parity with a single-pass run
    expected = pipe.annotate(web).where(F.col("keep"))
    got = t.read()
    assert got.count() == expected.count() == sum(s.n_kept for s in states)
    exp_urls = {r["url"] for r in expected.select("url").collect()}
    got_urls = {r["url"] for r in got.select("url").collect()}
    assert got_urls == exp_urls


def test_partial_run_then_resume(spark, tmp_path):
    """Kill the run after 2 buckets (simulated by a pipeline whose
    annotate raises on the 3rd call); resuming with a healthy pipeline
    finishes only the remaining buckets."""
    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.checkpoint import run_resumable_snapshots

    web = _web(spark, 200, seed=9)
    t = _mk(spark, tmp_path, "out2")

    class Flaky(QualityFilterPipeline):
        calls = 0

        def annotate(self, df):
            type(self).calls += 1
            if type(self).calls == 3:
                raise RuntimeError("simulated crash")
            return super().annotate(df)

    with pytest.raises(RuntimeError):
        run_resumable_snapshots(Flaky(), web, t, n_buckets=4)
    assert len(t.snapshots()) == 2

    states = run_resumable_snapshots(QualityFilterPipeline(), web, t, n_buckets=4)
    assert [s.bucket for s in states] == [0, 1, 2, 3]
    assert len(t.snapshots()) == 4
    assert sum(s.n_docs for s in states) == 200


def test_compact_rewrites_files_preserving_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, "compact")
    for i in range(4):
        t.append(
            spark.range(i * 10, (i + 1) * 10)
            .toDF("id")
            .withColumn("src", (F.col("id") % 3).cast("string"))
            .repartition(3)
        )
    before_sid = t.current_snapshot_id()
    n_files_before = len(t.snapshot(before_sid).files)
    assert n_files_before >= 8

    sid = t.compact(target_files=2)
    s = t.snapshot(sid)
    assert s.operation == "compact"
    assert s.properties["files_before"] == n_files_before
    assert s.properties["files_after"] == len(s.files) <= 2
    # identical rows
    assert sorted(r["id"] for r in t.read().collect()) == list(range(40))
    # time travel to the pre-compaction snapshot still works
    assert t.read(before_sid).count() == 40
    # vacuum keeps both (both snapshots reachable on the chain)
    assert t.vacuum() == []


def test_compact_clustered_layout(spark, tmp_path):
    from soda_core_spark.sources.layout import cluster_stats

    t = _mk(spark, tmp_path, "compactc")
    df = (
        spark.range(100)
        .toDF("id")
        .withColumn("src", F.concat(F.lit("s"), (F.col("id") % 4).cast("string")))
    )
    t.append(df.repartition(6))
    sid = t.compact(target_files=4, cluster_cols=["src"])
    files = [os.path.join(t.path, f) for f in t.snapshot(sid).files]
    d = os.path.dirname(files[0])
    assert cluster_stats(d, "src").overlap_factor <= 1.5
    assert t.read().count() == 100


def test_compact_conflict_with_concurrent_append(spark, tmp_path):
    from soda_core_spark.sources.snapshots import CommitConflict, NoSuchSnapshot

    t = _mk(spark, tmp_path, "compactx")
    with pytest.raises(NoSuchSnapshot):
        t.compact()
    t.append(spark.range(10).toDF("id"))
    # emulate a compaction that loses the race: capture parent + rewrite,
    # let a writer land, then try to commit against the stale parent
    parent = t.current_snapshot_id()
    files = t._write_data(t.read(parent).coalesce(1))
    t.append(spark.range(10, 20).toDF("id"))
    with pytest.raises(CommitConflict):
        t._commit(parent, "compact", files, {})
    # the appended rows are intact and a RETRIED compaction now succeeds
    t.compact(target_files=1)
    assert sorted(r["id"] for r in t.read().collect()) == list(range(20))


# ---------------------------------------------------------------------------
# copy-on-write MERGE (upsert)
# ---------------------------------------------------------------------------


def test_merge_upserts_and_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]))
    src = spark.createDataFrame([(2, "B"), (9, "Z")], ["id", "v"])
    sid = t.merge(src, ["id"])
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}
    assert t.snapshot(sid).operation == "merge"


def test_merge_is_file_level_cow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # two appends → two disjoint file groups
    t.append(spark.createDataFrame([(i, "lo") for i in range(5)],
                                   ["id", "v"]).coalesce(1))
    s2 = t.append(spark.createDataFrame([(i, "hi") for i in range(100, 105)],
                                        ["id", "v"]).coalesce(1))
    before = set(t.snapshot(s2).files)
    # merge touches only the high-key file group
    sid = t.merge(spark.createDataFrame([(101, "HI")], ["id", "v"]), ["id"])
    after = set(t.snapshot(sid).files)
    carried = before & after
    assert carried, "untouched files must carry over by reference"
    props = t.snapshot(sid).properties
    assert props["files_rewritten"] == 1
    assert props["files_carried"] == len(carried)
    # low-key rows still present, exactly once
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == [(i, "lo") for i in range(5)] + [
        (100, "hi"), (101, "HI"), (102, "hi"), (103, "hi"), (104, "hi")]


def test_merge_time_travel_and_empty_table(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sid0 = t.merge(spark.createDataFrame([(1, "a")], ["id", "v"]), ["id"])
    assert {r["v"] for r in t.read(sid0).collect()} == {"a"}
    t.merge(spark.createDataFrame([(1, "A")], ["id", "v"]), ["id"])
    assert {r["v"] for r in t.read(sid0).collect()} == {"a"}  # pinned past
    assert {r["v"] for r in t.read().collect()} == {"A"}


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest

    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(spark.createDataFrame([(1, "x"), (1, "y")], ["id", "v"]),
                ["id"])


def test_merge_conflicts_with_concurrent_writer(spark, tmp_path):
    from soda_core_spark.sources.snapshots import CommitConflict, SnapshotTable

    import pytest

    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    # a second handle commits between our read of CURRENT and the merge:
    # simulate by appending via another handle inside the window — the
    # simplest deterministic equivalent is to monkeypatch _commit's parent
    # by appending first, then calling merge with a stale handle state.
    t2 = SnapshotTable(spark, t.path)
    src = spark.createDataFrame([(1, "x")], ["id", "v"])
    orig = t._write_data

    def write_and_race(df):
        files = orig(df)
        t2.append(spark.createDataFrame([(7, "r")], ["id", "v"]))
        return files

    t._write_data = write_and_race
    with pytest.raises(CommitConflict):
        t.merge(src, ["id"])


# ---------------------------------------------------------------------------
# copy-on-write DELETE + snapshot expiration
# ---------------------------------------------------------------------------


def test_delete_where_is_cow(spark, tmp_path):
    from pyspark.sql import functions as F

    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(i, "lo") for i in range(5)],
                                   ["id", "v"]).coalesce(1))
    s2 = t.append(spark.createDataFrame([(i, "hi") for i in range(100, 105)],
                                        ["id", "v"]).coalesce(1))
    before = set(t.snapshot(s2).files)
    sid = t.delete_where(F.col("id") == 102)
    after = set(t.snapshot(sid).files)
    assert before & after, "untouched file group carries over"
    assert t.snapshot(sid).properties["files_rewritten"] == 1
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 103, 104]
    # time travel still sees the deleted row
    assert 102 in {r["id"] for r in t.read(s2).collect()}
    # SQL-string predicate form
    t.delete_where("v = 'lo'")
    assert sorted(r["id"] for r in t.read().collect()) == [100, 101, 103, 104]


def test_expire_snapshots_truncates_history(spark, tmp_path):
    import pytest

    from soda_core_spark.sources.snapshots import NoSuchSnapshot

    t = _mk(spark, tmp_path)
    s1 = t.append(spark.createDataFrame([(1,)], ["id"]))
    s2 = t.overwrite(spark.createDataFrame([(2,)], ["id"]))
    s3 = t.append(spark.createDataFrame([(3,)], ["id"]))
    expired = t.expire_snapshots(keep_last=2)
    assert expired == [s1]
    chain = [s.snapshot_id for s in t.snapshots()]
    assert chain == [s2, s3]
    assert t.snapshots()[0].parent_id is None  # re-rooted
    with pytest.raises(NoSuchSnapshot):
        t.read(s1)
    # current data unaffected; vacuum reclaims the orphaned s1 file
    assert sorted(r["id"] for r in t.read().collect()) == [2, 3]
    removed = t.vacuum()
    assert removed, "expired-only files are reclaimed"
    assert sorted(r["id"] for r in t.read().collect()) == [2, 3]
    assert t.expire_snapshots(keep_last=5) == []  # nothing to expire
