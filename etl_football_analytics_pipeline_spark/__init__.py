"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (manhzZ2k5/ETL-Football-Analytics-Pipeline).

Not a port: the reference is an eager single-process pandas + Postgres
pipeline; this engine re-expresses every operator in its inventory
(SURVEY.md §2) as lazy, Catalyst-optimized DataFrame plans designed for
a multi-executor cluster at 100 TB scale:

- declarative DataFrame/SQL plans (predicate pushdown, column pruning,
  broadcast-join selection are Catalyst's job, not ours),
- parquet columnar storage between layers (bronze/silver/gold),
- broadcast hash joins for dimension lookups, AQE for skew,
- anti-join+union MERGE in place of per-row ON CONFLICT upserts,
- window functions for standings / recent-form / surrogate keys,
- LLM-data-pipeline extensions: dedup (exact/minhash/simhash), ANN
  similarity search, text analysis, multimodal binary columns.
"""

__version__ = "0.1.0"
