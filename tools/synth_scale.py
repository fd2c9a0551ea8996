#!/usr/bin/env python3
"""Dev-time scale-sweep fixture synthesis (judge r9 item 6).

Builds a ~KX-times fixture dir by unioning the sf0.1 tables with shifted
id ranges: events (event_id/user_id shifted per copy) and documents
(doc_id shifted; text kept verbatim, so each document gains K-1 exact
twins — a realistic web-crawl dedup stress). All other tables are copied
through unchanged so every registered query and its DuckDB oracle can
still resolve its views.

Usage: python3 tools/synth_scale.py <outDir> [copies=10]

Then:  SPARK_GRAFT_ONLY='^(adv_asof|adv_sweepline|st_|dedup_)' \
         java -cp ... graft.Verify <outDir> <verifyOut>
       python3 tools/selfcheck.py <outDir> <verifyOut>

NOT part of the shipped library — de-risks the sf0.01 gate's blind spot
(r9's sf0.1 sweep caught two latent defects; this pushes one notch up).
"""
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPY_THROUGH = ["region", "nation", "customer", "supplier", "part",
                "orders"]
EVENT_STRIDE = 10_000_000   # far above sf0.1's max event_id
USER_STRIDE = 1_000_000     # far above sf0.1's max user_id
DOC_STRIDE = 1_000_000      # far above sf0.1's max doc_id
VEC_STRIDE = 1_000_000      # far above sf0.1's max vec_id
ORDER_STRIDE = 10_000_000   # far above sf0.1's max l_orderkey


def main(out_dir: str, copies: int) -> None:
    con = duckdb.connect()
    import os
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_THROUGH:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
    # lineitem scales by shifted l_orderkey (r15 — the FM twins sample
    # on l_orderkey, so an unscaled lineitem made the "10x" FM compare
    # a re-run of sf0.1). Every copy keeps l_partkey verbatim: feature
    # ids and the param table are unchanged, sample count is 10x — the
    # epoch-math FP-order stress the sweep exists for. Shifted keys
    # lose their orders-side FK partner; engine and oracle read the
    # SAME fixture, so joins stay comparable.
    li_parts = " UNION ALL ".join(
        f"SELECT * REPLACE (l_orderkey + {k * ORDER_STRIDE} AS l_orderkey) "
        f"FROM read_parquet('{SRC}/lineitem.parquet')"
        for k in range(copies))
    con.execute(
        f"COPY ({li_parts}) TO '{out_dir}/lineitem.parquet' "
        "(FORMAT PARQUET)")
    ev_parts = " UNION ALL ".join(
        f"SELECT event_id + {k * EVENT_STRIDE} AS event_id, ts, "
        f"user_id + {k * USER_STRIDE} AS user_id, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')"
        for k in range(copies))
    con.execute(
        f"COPY ({ev_parts}) TO '{out_dir}/events.parquet' (FORMAT PARQUET)")
    # TWO copies of documents/embeddings (r13 verdict #2 + r14 advice):
    # a single row group gives DuckDB zero pipeline parallelism, so the
    # heavy all-pairs oracles ran single-threaded for 40+ minutes — but
    # shrinking ROW_GROUP_SIZE on the shared file also changed the
    # ENGINE's scan profile (many tiny row groups add per-group
    # overhead), making 10x bench numbers incomparable with fixtures
    # generated before the change. So: the engine-facing file keeps
    # DEFAULT row groups (comparable with pre-r14 10x records), and an
    # oracle-only small-row-group copy goes under oracle/ — selfcheck
    # prefers it when present. Same values either way.
    os.makedirs(f"{out_dir}/oracle", exist_ok=True)
    doc_parts = " UNION ALL ".join(
        f"SELECT doc_id + {k * DOC_STRIDE} AS doc_id, text, lang, source, "
        f"n_chars FROM read_parquet('{SRC}/documents.parquet')"
        for k in range(copies))
    con.execute(
        f"COPY ({doc_parts}) TO '{out_dir}/documents.parquet' "
        "(FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT * FROM '{out_dir}/documents.parquet') "
        f"TO '{out_dir}/oracle/documents.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 8192)")
    # embedding vectors are copied VERBATIM per shifted vec_id — every
    # vector gains copies-1 exact twins, a deliberate tie stress for the
    # ANN/top-k family (any non-deterministic tie-break shows up as a
    # hash mismatch here long before it would at 100 TB)
    vec_parts = " UNION ALL ".join(
        f"SELECT vec_id + {k * VEC_STRIDE} AS vec_id, embedding, label "
        f"FROM read_parquet('{SRC}/embeddings.parquet')"
        for k in range(copies))
    con.execute(
        f"COPY ({vec_parts}) TO '{out_dir}/embeddings.parquet' "
        "(FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT * FROM '{out_dir}/embeddings.parquet') "
        f"TO '{out_dir}/oracle/embeddings.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
    for t in ["events", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
