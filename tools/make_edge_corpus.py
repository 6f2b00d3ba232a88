#!/usr/bin/env python3
"""Generate the adversarial edge-case tables (dev tooling, like local_verify).

Usage: python3 tools/make_edge_corpus.py [outDir]   (default /tmp/edge_sf)

Covers the crash classes the engine guards against under Spark 4's ANSI
default: empty / 1-token / 2-token / punctuation-only / whitespace-only
documents (shingle + division guards), exact-duplicate docs, a zero
embedding vector (cosine zero-norm guard), singleton event types
(ev_anomaly n-1 guard), and same-timestamp events (session/window
tiebreaks). Verify against it with:

  sbt "runMain graft.Verify <outDir> /tmp/edge_out"
  python3 tools/local_verify.py <outDir> /tmp/edge_out <text/dedup/ev queries>

TPC-H-table queries fail to load (by design — only documents/embeddings/
events exist here); knn_lsh's oracle requires 64-dim embeddings and is out
of scope for this corpus.
"""
import sys, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edge_sf"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM (VALUES
    (0, '', 'en', 'web', 0),
    (1, 'one', 'en', 'web', 3),
    (2, 'one two', 'en', 'web', 7),
    (3, 'a b c', 'en', 'web', 5),
    (4, '的 是 了', 'zh', 'web', 5),
    (5, '!!! ??? ...', 'en', 'web', 11),
    (6, 'the quick brown fox jumps over the lazy dog again and again', 'en', 'books', 60),
    (7, 'the quick brown fox jumps over the lazy dog again and again', 'en', 'books', 60),
    (8, 'der die und das ein zwei drei vier', 'de', 'web', 34),
    (9, '   ', 'en', 'web', 3)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT * FROM (VALUES
    (0, CAST([0.0,0.0,0.0,0.0] AS FLOAT[]), 0),
    (1, CAST([1.0,2.0,3.0,4.0] AS FLOAT[]), 1),
    (2, CAST([1.0,2.0,3.0,4.1] AS FLOAT[]), 1),
    (3, CAST([-1.0,0.5,2.0,0.0] AS FLOAT[]), 0),
    (4, CAST([0.1,0.1,0.1,0.1] AS FLOAT[]), 1)
  ) t(vec_id, embedding, label)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT * FROM (VALUES
    (1, TIMESTAMP '2024-01-01 00:00:00', 1, 'click', 10.0, '{{"k": 60}}'),
    (2, TIMESTAMP '2024-01-01 00:00:00', 1, 'click', 10.0, '{{"k": 1}}'),
    (3, TIMESTAMP '2024-01-01 01:00:00', 1, 'singleton', 5.0, '{{}}'),
    (4, TIMESTAMP '2024-01-01 02:00:00', 2, 'click', 10.0, '{{}}'),
    (5, TIMESTAMP '2024-01-01 02:00:00', 2, 'click', 10.0, '{{}}'),
    (6, TIMESTAMP '2024-01-02 00:00:00', 2, 'view', 7.5, '{{}}')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print(f"edge tables written to {out}")
