"""Parse-layer queries()/oracle_sql() twins (SURVEY.md §2.6) — stub,
filled in after the relational core lands. The fn-* expression library
itself lives in genpipe_spark/functions/ and is unit-tested in tests/."""
