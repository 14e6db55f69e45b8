"""LLM-data-pipeline queries (dedup / similarity / text analysis) — stub,
filled in after the relational core lands. Operators live in
genpipe_spark/operators/{dedup,similarity,text}.py."""
