#!/usr/bin/env python
"""Systematized sf1 LSH-recall sweep (VERDICT r9 item 7 — the j=0.8
lesson made a ROUND CHECKLIST step).

Every exact-transcript oracle over LSH candidates is only a true oracle
while banding recall is 1, so each round must (a) re-derive the
banding-math budget E[misses] = sum_pairs (1 - j^rows)^bands over the
CURRENT exact near-dup pair population at the largest swept SF — the
pair set grows with data, and "recall was 1 when we checked" is not a
budget — and (b) re-run engine-vs-oracle parity for every entry that
rides those candidates.

All LSH entries share one banding config (96 hashes / 24 bands, rows=4,
jaccard threshold 0.5, documents shingles), so one exact pair
distribution per SF prices every entry. dedup-semantic has no
probabilistic recall (pinned-seed two-level assignment is
deterministic) — it rides the parity leg only.

Usage:
  python scripts/lsh_recall_sweep.py [sf_dir] [--full]
    sf_dir  defaults to .localdata/sf1
    --full  adds pipeline-curation (expensive oracle: exact Jaccard
            recompute inside the staged twin)

Exit 0 = budget holds AND all parities pass.
"""
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb  # noqa: E402

from genpipe_spark import registry  # noqa: E402
from genpipe_spark.queries.llmdata import _SHINGLES_CTE  # noqa: E402
from genpipe_spark.session import get_spark  # noqa: E402
from genpipe_spark.tables import TABLE_NAMES  # noqa: E402
from tests.oracle_utils import compare, run_oracle  # noqa: E402

ROWS, BANDS, THRESHOLD = 4, 24, 0.5
BUDGET = 0.01  # E[missed pairs] ceiling across the whole population

# (entry, sf override or None=swept SF): stream-dedup-incremental is
# fixture-write-bound beyond sf0.1 (bench_session_r9.py caveat) — its
# recall math is identical, so parity rides the smaller SF.
ENTRIES = [
    ("dedup-minhash-lsh", None),
    ("dedup-incremental", None),
    ("dedup-semantic", None),
    ("stream-dedup-incremental", "/root/testdata/sf0.1"),
]
FULL_ENTRIES = [("pipeline-curation", None)]


def pair_jaccards(sf_dir: str) -> list[float]:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        except duckdb.IOException:
            pass
    sql = _SHINGLES_CTE + f"""
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT n_inter * 1.0 / (sa.n + sb.n - n_inter) AS j
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0
          >= {THRESHOLD}
    """
    return [r[0] for r in con.execute(sql).fetchall()]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    sf = args[0] if args else str(ROOT / ".localdata" / "sf1")

    js = pair_jaccards(sf)
    if not js:
        print(f"FAIL no exact near-dup pairs at {sf} — fixture probe "
              "failed (the Poisson-bootstrap degeneracy lesson)")
        return 1
    e_miss = sum((1 - j ** ROWS) ** BANDS for j in js)
    worst = min(js)
    per_worst = (1 - worst ** ROWS) ** BANDS
    print(
        f"banding {ROWS * BANDS}/{BANDS}: {len(js)} exact pairs at {sf}, "
        f"min j={worst:.4f} (per-pair miss {per_worst:.2e}), "
        f"E[misses]={e_miss:.2e} (budget {BUDGET})"
    )
    ok = e_miss < BUDGET

    registry.load_all_query_modules()
    spark = get_spark("lsh-sweep", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for name, override in ENTRIES + (FULL_ENTRIES if full else []):
        esf = override or sf
        try:
            probs = compare(
                registry.QUERIES[name](spark, esf),
                run_oracle(registry.ORACLES[name], esf),
            )
        except Exception as exc:  # noqa: BLE001
            probs = [repr(exc)[:300]]
        status = "PASS" if not probs else f"FAIL {probs}"
        ok = ok and not probs
        print(f"{status} {name} @ {esf}")
    spark.stop()
    print("SWEEP", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
