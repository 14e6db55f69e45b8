"""merge_apply (operators/cdc.py) semantics on hand-built changesets —
the fixture-scale value check is the oracle-parity query merge-upsert."""

from __future__ import annotations

import pytest

from genpipe_spark.operators.cdc import merge_apply


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id bigint, v string, x bigint"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v string, x bigint, seq bigint, op string")


def _apply(spark, rows, **kw):
    out = merge_apply(_snap(spark), _changes(spark, rows), ["id"], "seq", **kw)
    return {(r["id"], r["v"], r["x"]) for r in out.collect()}


def test_latest_sequence_wins_out_of_order(spark):
    got = _apply(
        spark,
        [
            (2, "b2", 21, 5, "U"),
            (2, "b3", 22, 9, "U"),  # later seq arrives "first" in the file
            (2, "b1", 20, 1, "U"),
        ],
    )
    assert got == {(1, "a", 10), (2, "b3", 22), (3, "c", 30)}


def test_delete_then_reinsert_ordering(spark):
    # delete at seq 5, re-insert at seq 8: the key survives with the new
    # payload; the reverse ordering (insert then delete) removes it
    alive = _apply(spark, [(3, "gone", 0, 5, "D"), (3, "back", 99, 8, "U")])
    dead = _apply(spark, [(3, "back", 99, 5, "U"), (3, "gone", 0, 8, "D")])
    assert (3, "back", 99) in alive
    assert not any(k == 3 for k, _, _ in dead)


def test_insert_new_key_and_untouched_rows(spark):
    got = _apply(spark, [(7, "new", 70, 1, "U")])
    assert got == {(1, "a", 10), (2, "b", 20), (3, "c", 30), (7, "new", 70)}


def test_validate_rejects_ambiguous_duplicates(spark):
    # the check rides the main window pass (no second scan), so it
    # surfaces at ACTION time as Spark's USER_RAISED_EXCEPTION rather
    # than a driver-side ValueError before the job (VERDICT r5 rework)
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="duplicate"):
        _apply(
            spark,
            [(1, "x", 0, 5, "U"), (1, "y", 1, 5, "U")],
            validate=True,
        )
    # a duplicate seq BELOW the winner cannot change the result and
    # must NOT trip validation
    got = _apply(
        spark,
        [(1, "x", 0, 3, "U"), (1, "y", 1, 3, "U"), (1, "z", 2, 9, "U")],
        validate=True,
    )
    assert (1, "z", 2) in got
    # two NULL sequences for one key are just as ambiguous as two
    # equal ones — eqNullSafe detection (round-6 review: a plain !=
    # coalesced NULLs to 'pass' and picked an arbitrary winner)
    with pytest.raises(SparkRuntimeException, match="duplicate"):
        _apply(
            spark,
            [(1, "a", 0, None, "U"), (1, "b", 1, None, "U")],
            validate=True,
        )
    # without validate, the documented tie-break (op desc) is applied
    got = _apply(spark, [(1, "x", 0, 5, "U"), (1, "y", 1, 5, "D")])
    assert (1, "x", 0) in got
    # a key whose ONLY change row has a NULL sequence is unambiguous:
    # lead(seq) is NULL because there IS no next row, not because a
    # second NULL-seq row ties — must pass (round-7 review: the
    # __has_next marker distinguishes the two)
    got = _apply(spark, [(1, "solo", 7, None, "U")], validate=True)
    assert (1, "solo", 7) in got


def test_snapshot_diff_roundtrip(spark):
    """merge_apply(old, snapshot_diff(old, new)) must reproduce new
    exactly — the diff is a faithful changeset (inverse pair), and
    unchanged keys emit no diff row."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.cdc import merge_apply, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k: long, v: string, x: long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 99), (5, "e", 50)],
        "k: long, v: string, x: long",
    )
    diff = snapshot_diff(old, new, ["k"])
    ops = {(r["k"], r["op"]) for r in diff.collect()}
    assert ops == {(2, "U"), (3, "D"), (4, "D"), (5, "I")}  # 1 unchanged
    applied = merge_apply(
        old, diff.withColumn("seq", F.lit(1)), ["k"], "seq"
    )
    assert {tuple(r) for r in applied.collect()} == {
        tuple(r) for r in new.collect()
    }


def test_null_op_upserts_instead_of_vanishing(spark):
    # a malformed feed with a NULL op must not silently delete the key:
    # `op != 'D'` alone is NULL-valued there (code-review regression)
    got = _apply(spark, [(1, "fixed", 99, 5, None)])
    assert (1, "fixed", 99) in got


def test_incremental_export_rewrites_only_dirty_partitions(spark, tmp_path):
    """plans/export.incremental_export: refresh touches ONLY partitions
    with diff rows — proven by file identity (untouched partition's
    part-files survive byte-for-byte with the same names), including
    the fully-deleted-partition edge; final mirror == new snapshot."""
    import os

    from pyspark.sql import functions as F

    from genpipe_spark.plans.export import incremental_export

    dest = str(tmp_path / "mirror")
    schema = "k: long, v: string, p: string"
    snap1 = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y"), (4, "d", "z")], schema
    )
    r1 = incremental_export(spark, snap1, dest, ["k"], "p")
    assert r1["partitions_rewritten"] == 3  # bootstrap writes everything

    def files(part):
        d = f"{dest}/p={part}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    x_before, y_before = files("x"), files("y")
    # change partition x (update k=2), delete partition z entirely,
    # leave y untouched
    snap2 = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "x"), (3, "c", "y")], schema
    )
    r2 = incremental_export(spark, snap2, dest, ["k"], "p")
    assert r2 == {"changed_rows": 2, "partitions_rewritten": 2}  # x + z
    assert files("y") == y_before  # untouched partition: same files
    assert files("x") != x_before  # dirty partition: rewritten
    assert not os.path.exists(f"{dest}/p=z")  # dead partition removed
    mirror = {tuple(r) for r in spark.read.parquet(dest).select("k", "v", "p").collect()}
    assert mirror == {(1, "a", "x"), (2, "B", "x"), (3, "c", "y")}
    # idempotent no-op refresh
    r3 = incremental_export(spark, snap2, dest, ["k"], "p")
    assert r3 == {"changed_rows": 0, "partitions_rewritten": 0}


def test_scd2_change_feed_roundtrip(spark):
    """scd2_history(scd2_change_feed(h)) == h — the feed is exactly the
    collapsed canonical stream, covering deletes mid-key, final closed
    versions, re-inserts, and open versions."""
    from genpipe_spark.operators.cdc import scd2_change_feed, scd2_history

    changes = spark.createDataFrame(
        [
            # key 1: update, noop-update (collapses), update, delete,
            # re-insert with the PRE-DELETE attrs (must not collapse)
            (1, "a", 10, 1, "U"), (1, "a", 10, 2, "U"), (1, "b", 20, 3, "U"),
            (1, "b", 20, 5, "D"), (1, "b", 20, 8, "U"),
            # key 2: single open version
            (2, "z", 0, 4, "U"),
            # key 3: insert then final delete (closed, no successor)
            (3, "q", 7, 2, "U"), (3, "q", 7, 9, "D"),
        ],
        "k: long, seg: string, x: long, seq: long, op: string",
    )
    h = scd2_history(changes, ["k"], "seq", ["seg", "x"], op_col="op")
    feed = scd2_change_feed(h, ["k"], ["seg", "x"])
    ops = {(r["k"], r["seq"], r["op"]) for r in feed.collect()}
    assert ops == {
        (1, 1, "U"), (1, 3, "U"), (1, 5, "D"), (1, 8, "U"),
        (2, 4, "U"),
        (3, 2, "U"), (3, 9, "D"),
    }
    h2 = scd2_history(feed, ["k"], "seq", ["seg", "x"], op_col="op")
    assert {tuple(r) for r in h2.collect()} == {tuple(r) for r in h.collect()}


def test_incremental_export_partition_move(spark, tmp_path):
    """A row whose PARTITION VALUE changes must dirty BOTH partitions —
    the old one would otherwise keep a stale copy (round-6 review);
    NULL partition values round-trip through the Hive default dir."""
    import os

    from genpipe_spark.plans.export import incremental_export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    snap1 = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)], schema
    )
    incremental_export(spark, snap1, dest, ["k"], "p")
    # move k=1 from x to z (x empties), update the NULL-partition row
    snap2 = spark.createDataFrame(
        [(1, "a", "z"), (2, "b", "y"), (3, "C", None)], schema
    )
    r = incremental_export(spark, snap2, dest, ["k"], "p")
    assert r["partitions_rewritten"] == 3  # x (old), z (new), NULL
    assert not os.path.exists(f"{dest}/p=x")  # emptied source partition
    mirror = {tuple(r) for r in spark.read.parquet(dest).select("k", "v", "p").collect()}
    assert mirror == {(1, "a", "z"), (2, "b", "y"), (3, "C", None)}


def test_incremental_export_rejects_unsafe_partition_values(spark, tmp_path):
    from genpipe_spark.plans.export import incremental_export

    bad = spark.createDataFrame(
        [(1, "a", "has space")], "k: long, v: string, p: string"
    )
    with pytest.raises(ValueError, match="Hive-escaped"):
        incremental_export(spark, bad, str(tmp_path / "m2"), ["k"], "p")


def _mirror_rows(spark, dest):
    return {
        tuple(r)
        for r in spark.read.parquet(dest).select("k", "v", "p").collect()
    }


def test_incremental_export_crash_before_manifest_is_fully_old(
    spark, tmp_path, monkeypatch
):
    """Crash BEFORE the commit manifest is published: the live mirror
    must read fully-OLD (byte-untouched), and the next refresh must
    discard the orphan stage and converge to fully-new."""
    import genpipe_spark.plans.export as export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    snap1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], schema)
    export.incremental_export(spark, snap1, dest, ["k"], "p")

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest publish")

    monkeypatch.setattr(export, "_write_manifest", boom)
    snap2 = spark.createDataFrame([(1, "A", "x"), (2, "b", "y")], schema)
    with pytest.raises(RuntimeError, match="injected"):
        export.incremental_export(spark, snap2, dest, ["k"], "p")
    # mirror is fully-old; the stage leftover sits outside it
    assert _mirror_rows(spark, dest) == {(1, "a", "x"), (2, "b", "y")}
    monkeypatch.undo()
    assert export.recover_export(spark, dest) == "discarded_stage"
    r = export.incremental_export(spark, snap2, dest, ["k"], "p")
    assert r["partitions_rewritten"] == 1
    assert _mirror_rows(spark, dest) == {(1, "A", "x"), (2, "b", "y")}


def test_incremental_export_crash_mid_apply_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Crash in the WORST window — after the manifest is published and
    after a dirty partition's live directory was already deleted but
    before its staged replacement was renamed in. recover_export must
    roll the commit forward to fully-NEW (incl. dead-dir removal)."""
    import os

    import genpipe_spark.plans.export as export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    snap1 = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")], schema
    )
    export.incremental_export(spark, snap1, dest, ["k"], "p")

    real_apply = export._apply_commit

    def partial_apply(spark_, base, stage, payload):
        # delete the first rewrite target's LIVE dir, then crash before
        # the rename — dest is now missing that partition entirely
        mkpath, fs = export._hadoop(spark_, base)
        d = payload["rewrite"][0]
        fs.delete(mkpath(f"{base}/{d}"), True)
        raise RuntimeError("injected crash mid-swap")

    monkeypatch.setattr(export, "_apply_commit", partial_apply)
    # update x, delete z entirely, leave y untouched
    snap2 = spark.createDataFrame([(1, "A", "x"), (2, "b", "y")], schema)
    with pytest.raises(RuntimeError, match="mid-swap"):
        export.incremental_export(spark, snap2, dest, ["k"], "p")
    monkeypatch.setattr(export, "_apply_commit", real_apply)
    assert export.recover_export(spark, dest) == "rolled_forward"
    assert _mirror_rows(spark, dest) == {(1, "A", "x"), (2, "b", "y")}
    assert not os.path.exists(f"{dest}/p=z")
    assert not os.path.exists(dest + "__stage")
    assert not os.path.exists(dest + "__commit.json")


def test_incremental_export_crash_between_apply_and_cleanup(
    spark, tmp_path, monkeypatch
):
    """VERDICT r6 item 1's exact scenario: interrupt between the
    partition rewrite and the cleanup. The manifest + stage leftovers
    must roll forward idempotently (every swap already done → no-ops)
    and the mirror must read fully-new throughout."""
    import genpipe_spark.plans.export as export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    snap1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], schema)
    export.incremental_export(spark, snap1, dest, ["k"], "p")

    real_apply = export._apply_commit

    def apply_then_crash(*a, **k):
        real_apply(*a, **k)
        raise RuntimeError("injected crash before cleanup")

    monkeypatch.setattr(export, "_apply_commit", apply_then_crash)
    snap2 = spark.createDataFrame([(1, "A", "x")], schema)  # y dies
    with pytest.raises(RuntimeError, match="before cleanup"):
        export.incremental_export(spark, snap2, dest, ["k"], "p")
    # apply completed: mirror ALREADY fully-new despite the leftovers
    assert _mirror_rows(spark, dest) == {(1, "A", "x")}
    monkeypatch.undo()
    assert export.recover_export(spark, dest) == "rolled_forward"
    assert _mirror_rows(spark, dest) == {(1, "A", "x")}
    # and a subsequent refresh is a clean no-op
    r = export.incremental_export(spark, snap2, dest, ["k"], "p")
    assert r == {"changed_rows": 0, "partitions_rewritten": 0}


def test_compact_mirror_merges_only_oversized_partitions(spark, tmp_path):
    """plans/export.compact_mirror: partitions over the small-file
    budget are rewritten to ceil(bytes/target) files; partitions within
    budget keep their files byte-identical; rows never change; a second
    pass is a no-op; a subsequent incremental refresh still works."""
    import os

    from genpipe_spark.plans.export import compact_mirror, incremental_export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    rows = [(i, f"v{i}", "x") for i in range(13)] + [(99, "solo", "y")]
    snap = spark.createDataFrame(rows, schema).repartition(12)
    incremental_export(spark, snap, dest, ["k"], "p")

    def files(part):
        d = f"{dest}/p={part}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    assert len(files("x")) > 4  # the fixture really is fragmented
    y_before = files("y")
    before = {tuple(r) for r in spark.read.parquet(dest).collect()}
    r = compact_mirror(spark, dest, "p", max_files=4)
    assert r["partitions_compacted"] == 1
    assert r["files_before"] > 4 and r["files_after"] == 1
    assert len(files("x")) == 1
    assert files("y") == y_before  # within budget: untouched
    after = {tuple(r) for r in spark.read.parquet(dest).collect()}
    assert after == before  # layout-only operation
    # idempotent second pass
    assert compact_mirror(spark, dest, "p", max_files=4) == {
        "partitions_compacted": 0, "files_before": 0, "files_after": 0
    }
    # the MERGE + OPTIMIZE cycle composes: refresh over the compacted
    # mirror still diffs/rewrites correctly
    snap2 = spark.createDataFrame(
        [(0, "CHANGED", "x"), (99, "solo", "y")]
        + [(i, f"v{i}", "x") for i in range(1, 13)],
        schema,
    )
    r2 = incremental_export(spark, snap2, dest, ["k"], "p")
    assert r2["changed_rows"] == 1 and r2["partitions_rewritten"] == 1
    got = {tuple(r) for r in spark.read.parquet(dest).collect()}
    assert got == {tuple(r) for r in snap2.collect()}


def test_compact_mirror_crash_mid_apply_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Crash in compact_mirror's worst window (live dir deleted, staged
    rename pending): the shared recover_export heals to the compacted
    layout with zero row loss."""
    import os

    import genpipe_spark.plans.export as export

    dest = str(tmp_path / "m")
    schema = "k: long, v: string, p: string"
    snap = spark.createDataFrame(
        [(i, f"v{i}", "x") for i in range(13)], schema
    ).repartition(12)
    export.incremental_export(spark, snap, dest, ["k"], "p")
    before = {tuple(r) for r in spark.read.parquet(dest).collect()}

    real_apply = export._apply_commit

    def partial_apply(spark_, base, stage, payload):
        mkpath, fs = export._hadoop(spark_, base)
        fs.delete(mkpath(f"{base}/{payload['rewrite'][0]}"), True)
        raise RuntimeError("injected crash mid-compaction")

    monkeypatch.setattr(export, "_apply_commit", partial_apply)
    with pytest.raises(RuntimeError, match="mid-compaction"):
        export.compact_mirror(spark, dest, "p", max_files=4)
    monkeypatch.setattr(export, "_apply_commit", real_apply)
    assert export.recover_export(spark, dest) == "rolled_forward"
    assert {tuple(r) for r in spark.read.parquet(dest).collect()} == before
    d = f"{dest}/p=x"
    live = [f for f in os.listdir(d) if not f.startswith((".", "_"))]
    assert len(live) == 1  # healed INTO the compacted layout
    assert not os.path.exists(dest + "__stage")
    assert not os.path.exists(dest + "__commit.json")


def test_maintenance_pipeline_cycle(spark, tmp_path):
    """plans/maintenance: the MERGE + OPTIMIZE cycle as named stages —
    refresh mirrors the snapshot (diff-driven), optimize compacts the
    multi-file partition, stats from both stages land in ctx.conf,
    and a second dispatch with an unchanged snapshot is a no-op
    refresh (both stages idempotent — the re-run resumability
    contract of a scheduled maintenance loop)."""
    from genpipe_spark.plans.maintenance import build_maintenance_pipeline
    from genpipe_spark.plans.pipeline import PipelineContext

    dest = str(tmp_path / "mirror")
    schema = "k: long, v: string, p: string"
    snap = spark.createDataFrame(
        [(i, f"v{i}", "x" if i % 2 else "y") for i in range(40)], schema
    ).repartition(6)
    pipe = build_maintenance_pipeline()
    ctx = PipelineContext(
        dest=str(tmp_path / "stages"),
        conf={
            "mirror_dest": dest,
            "mirror_keys": ["k"],
            "mirror_partition_col": "p",
            "compact_max_files": 1,
            "compact_target_bytes": 1 << 30,
        },
        tables={"snapshot": snap},
    )
    pipe.run(spark, ctx, ["refresh", "optimize"], collect_metrics=True)
    stats = ctx.conf["maintenance_stats"]
    assert stats["refresh"]["partitions_rewritten"] == 2  # bootstrap
    assert stats["optimize"]["partitions_compacted"] == 2
    assert stats["optimize"]["files_after"] < stats["optimize"]["files_before"]
    got = {tuple(r) for r in spark.read.parquet(dest).select("k", "v", "p").collect()}
    want = {(i, f"v{i}", "x" if i % 2 else "y") for i in range(40)}
    assert got == want
    assert [m[0] for m in ctx.metrics] == ["refresh", "optimize"]
    # idempotent re-dispatch: no diff rows, nothing left to compact
    ctx2 = PipelineContext(
        dest=str(tmp_path / "stages2"),
        conf={
            "mirror_dest": dest,
            "mirror_keys": ["k"],
            "mirror_partition_col": "p",
            "compact_max_files": 1,
            "compact_target_bytes": 1 << 30,
        },
        tables={"snapshot": snap},
    )
    pipe.run(spark, ctx2, ["refresh", "optimize"])
    s2 = ctx2.conf["maintenance_stats"]
    assert s2["refresh"] == {"changed_rows": 0, "partitions_rewritten": 0}
    assert s2["optimize"]["partitions_compacted"] == 0
    got2 = {tuple(r) for r in spark.read.parquet(dest).select("k", "v", "p").collect()}
    assert got2 == want


def test_cdc_incremental_cross_batch_rejection(spark):
    """VERDICT r10 #4 'done' gate: a batch-2 doc sharing (almost) every
    chunk with a batch-1 survivor is FLAGGED in batch 2 — known chunks
    come from the PERSISTED index only, so batch 1 rejects nothing
    even when it contains the same text twice (within-batch repeats
    don't count), and a disjoint batch-2 doc passes."""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import (
        cdc_chunks,
        cdc_incremental_stats,
    )

    boiler = ("the quick brown fox jumps over the lazy dog again and "
              "again while the pipeline chunks every byte of it " * 8)
    fresh = ("completely different material with no shared substrings "
             "zyxw vutsr qponm lkjih gfedc 98765 43210 " * 8)
    b1 = spark.createDataFrame([
        Row(doc_id=1, text=boiler),
        Row(doc_id=2, text=boiler + " tail"),  # same chunks, same batch
    ])
    empty_idx = spark.createDataFrame([], "chash long")
    s1 = {r.doc_id: r for r in cdc_incremental_stats(b1, empty_idx).collect()}
    assert s1[1].rejected == 0 and s1[2].rejected == 0, (
        "within-batch repeats must not reject"
    )
    assert s1[1].n_known_chunks == 0
    idx = cdc_chunks(b1).select("chash").distinct()
    b2 = spark.createDataFrame([
        Row(doc_id=3, text=boiler),   # full overlap with batch-1 survivor
        Row(doc_id=4, text=fresh),    # disjoint
    ])
    s2 = {r.doc_id: r for r in cdc_incremental_stats(b2, idx).collect()}
    assert s2[3].rejected == 1, s2[3]
    assert s2[3].known_chars == s2[3].total_chars
    assert s2[4].rejected == 0 and s2[4].n_known_chunks == 0, s2[4]


def test_cdc_incremental_rejected_docs_not_indexed(spark):
    """ADVICE r11 'done' gate for the accepted-only index semantics
    (the sf0.01 fixture never exercises it — probed, 0 verdict flips):
    a batch-1 doc that is REJECTED must not feed the index, so a
    batch-2 doc made of the rejected doc's NOVEL tail scores as fully
    unknown. Under whole-batch indexing (the pre-r12 behavior) the
    same doc came back >50% known and was wrongly rejected — storage
    dedup must only index what it stored."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from genpipe_spark.operators.dedup import (
        cdc_chunks,
        cdc_incremental_stats,
    )

    x = ("shared boilerplate that batch zero stored first and batch "
         "one repeats verbatim to get itself rejected " * 24)  # ~2.4k
    z = ("novel tail material the rejected doc carried but never got "
         "indexed 13579 qwerty zxcvb " * 12)  # ~1k, |x| ~ 2|z|
    empty_idx = spark.createDataFrame([], "chash long")

    def accepted_only_step(batch, index):
        # the dedup-cdc-incremental entry's handle(), synchronous form
        ch = cdc_chunks(batch).localCheckpoint(eager=True)
        stats = cdc_incremental_stats(batch, index, chunks=ch)
        stats = stats.localCheckpoint(eager=True)
        acc = stats.where(F.col("rejected") == 0).select(
            F.col("doc_id").alias("id")
        )
        new_idx = index.unionByName(
            ch.join(acc, "id", "left_semi").select("chash").distinct()
        ).distinct()
        return stats, new_idx.localCheckpoint(eager=True)

    b0 = spark.createDataFrame([Row(doc_id=1, text=x)])
    s0, idx = accepted_only_step(b0, empty_idx)
    assert {r.doc_id: r.rejected for r in s0.collect()} == {1: 0}
    b1 = spark.createDataFrame([Row(doc_id=2, text=x + z)])
    s1, idx = accepted_only_step(b1, idx)
    r2 = s1.collect()[0]
    assert r2.rejected == 1, r2  # |x| ~ 2|z| -> known well over 50%
    b2 = spark.createDataFrame([Row(doc_id=3, text=z)])
    s2, idx = accepted_only_step(b2, idx)
    r3 = s2.collect()[0]
    assert r3.n_known_chunks == 0 and r3.rejected == 0, (
        f"rejected doc 2's novel chunks leaked into the index: {r3}"
    )


def test_compact_append_index_preserves_lookups(spark, tmp_path):
    """VERDICT r11 #5 'done' gate, part 1: compacting the append-only
    chunk-hash index dedupes rows and merges files while preserving
    the key SET exactly — so the dedup-cdc-incremental loop produces
    IDENTICAL stats against the compacted index (byte-equivalent
    lookups), and a crash after the manifest publish rolls forward to
    the fully-compacted state."""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import (
        cdc_chunks,
        cdc_incremental_stats,
    )
    from genpipe_spark.plans.export import (
        _hadoop,
        _write_manifest,
        compact_append_index,
        recover_export,
    )

    idx = str(tmp_path / "idx")
    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel " * 6,
        "india juliet kilo lima mike november oscar papa " * 6,
        "alpha bravo charlie delta echo foxtrot golf hotel " * 6,  # dup
    ]
    for i, txt in enumerate(texts):
        b = spark.createDataFrame([Row(doc_id=i, text=txt)])
        cdc_chunks(b).select("chash").distinct().write.mode(
            "append"
        ).parquet(idx)
    before = {r.chash for r in spark.read.parquet(idx).collect()}
    n_raw = spark.read.parquet(idx).count()
    assert n_raw > len(before), "fixture must contain cross-batch dupes"
    stats = compact_append_index(spark, idx, target_file_bytes=1 << 30)
    assert stats["rows_before"] == n_raw
    assert stats["rows_after"] == len(before)
    assert stats["files_after"] < stats["files_before"]
    after = {r.chash for r in spark.read.parquet(idx).collect()}
    assert after == before, "compaction changed the key set"
    # identical admission verdicts against the compacted index
    probe = spark.createDataFrame([Row(doc_id=99, text=texts[0] + " x")])
    got = cdc_incremental_stats(probe, spark.read.parquet(idx)).collect()
    assert got[0].rejected == 1, got

    # part 2: crash AFTER the manifest publish -> recover_export rolls
    # the commit forward idempotently (fully-compacted, no dup rows)
    base = idx.rstrip("/")
    stage, _ = base + "__stage", base + "__commit.json"
    mkpath, fs = _hadoop(spark, base)
    spark.read.parquet(base).distinct().coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    staged = [
        st.getPath().getName()
        for st in fs.listStatus(mkpath(stage))
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    live = [
        st.getPath().getName()
        for st in fs.listStatus(mkpath(base))
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    _write_manifest(
        spark, base + "__commit.json", {"rewrite": staged, "dead": live}
    )
    # no _apply_commit call here — this IS the crash point
    assert recover_export(spark, base) == "rolled_forward"
    healed = {r.chash for r in spark.read.parquet(base).collect()}
    assert healed == before
    assert spark.read.parquet(base).count() == len(before)
    assert recover_export(spark, base) == "clean"


def test_cdc_incremental_loop_with_midstream_compaction(spark, tmp_path):
    """VERDICT r11 #5 'done' gate, part 2: interleaving a compaction
    between micro-batches of the dedup-cdc-incremental loop leaves
    every per-doc stat row IDENTICAL to the uncompacted run — the
    oracle contract is untouched by index maintenance."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from genpipe_spark.operators.dedup import (
        cdc_chunks,
        cdc_incremental_stats,
    )
    from genpipe_spark.plans.export import compact_append_index
    from genpipe_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)

    def run(idx_dir, compact_after=None):
        out = []
        empty = spark.createDataFrame([], "chash long")
        for b in range(3):
            batch = docs.where(F.col("doc_id") % 3 == b)
            try:
                index = spark.read.parquet(idx_dir)
            except Exception:  # noqa: BLE001 — first batch, no index yet
                index = empty
            ch = cdc_chunks(batch).localCheckpoint(eager=True)
            stats = cdc_incremental_stats(
                batch, index, chunks=ch
            ).localCheckpoint(eager=True)
            out.extend(map(tuple, stats.collect()))
            acc = stats.where(F.col("rejected") == 0).select(
                F.col("doc_id").alias("id")
            )
            ch.join(acc, "id", "left_semi").select(
                "chash"
            ).distinct().write.mode("append").parquet(idx_dir)
            if compact_after is not None and b == compact_after:
                compact_append_index(spark, idx_dir)
        return sorted(out)

    plain = run(str(tmp_path / "idx_plain"))
    compacted = run(str(tmp_path / "idx_comp"), compact_after=1)
    assert plain == compacted


def test_cdc_chunks_arrow_matches_hof(spark):
    """r12 guide §4.2 equivalence pin: the vectorized numpy chunker
    must reproduce the HOF expression path EXACTLY — per (doc, chunk)
    row, same boundaries, same lengths, same 31-fold mod-M31 hashes —
    over adversarial shapes: empty/None text (dropped), sub-window
    docs, exact window-length docs, long repetitive text (many
    boundaries), unicode incl. a supplementary-plane char, and the
    real sf0.001 documents fixture."""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import cdc_chunks

    rows = [
        Row(doc_id=1, text=""),
        Row(doc_id=2, text="a"),
        Row(doc_id=3, text="abcdefg"),          # n = 7 < window
        Row(doc_id=4, text="abcdefgh"),         # n = 8 == window
        Row(doc_id=5, text="abcdefghi"),        # n = 9
        Row(doc_id=6, text="xyz " * 200),       # repetitive, long
        Row(doc_id=7, text="héllo wörld — ünïcode text 🎵 " * 20),
        Row(doc_id=8, text="plain ascii with spaces and 123 " * 40),
        Row(doc_id=9, text=None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for frame in (
        df,
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"),
    ):
        hof = {
            (r.id, r.ci): (r.clen, r.chash)
            for r in cdc_chunks(frame, arrow=False).collect()
        }
        arw = {
            (r.id, r.ci): (r.clen, r.chash)
            for r in cdc_chunks(frame, arrow=True).collect()
        }
        assert hof == arw
        assert len(arw) > 0
