#!/usr/bin/env python3
"""Dev-time SLICED oracle comparison for the budget-busting 10x twins.

The heavy oracles (banded-LSH candidate DISTINCTs, all-pairs dots) hold
working sets far past box RAM+disk when run monolithically at the 10x
densification fixture (sim_topk_lsh OOM'd 100 GB RAM + 80 GB spill).
Their work is SEPARABLE by the left/query vector id: restricting the
generating join to one id-residue class cuts the working set by the
slice fraction while the union over residues is exactly the full result
(the id either partitions the output rows - query_id - or is the output
v1). So: inject the residue predicate textually at the single
generating-join site of the ORIGINAL oracle SQL, run DuckDB per slice,
and compare each slice against the engine dump filtered by the same
residue. The oracle contract (oracle_sql.json) is untouched - this is a
comparison STRATEGY, not an oracle change.

Usage: selfcheck_sliced.py <sfDir> <outDir> <query> <nslices>
"""
import json
import os
import sys

import duckdb
import pandas as pd

from selfcheck import TABLES, canon  # same canonical form as the gate

# (injection site, sliced replacement template, dump slice column expr)
SLICE_RULES = {
    "sim_topk_lsh": (
        "WHERE q.vec_id % 50 = 0",
        "WHERE q.vec_id % 50 = 0 AND (q.vec_id // 50) % {n} = {i}",
        lambda df, n, i: df[(df["query_id"] // 50) % n == i],
    ),
    "sim_range_search": (
        "AND a.vec_id < b.vec_id",
        "AND a.vec_id < b.vec_id AND a.vec_id % {n} = {i}",
        lambda df, n, i: df[df["v1"] % n == i],
    ),
    "sim_range_search_lsh": (
        "AND a.vec_id < b.vec_id",
        "AND a.vec_id < b.vec_id AND a.vec_id % {n} = {i}",
        lambda df, n, i: df[df["v1"] % n == i],
    ),
    "sim_range_search_auto": (  # two sites (brute + lsh branch): same rule
        "AND a.vec_id < b.vec_id",
        "AND a.vec_id < b.vec_id AND a.vec_id % {n} = {i}",
        lambda df, n, i: df[df["v1"] % n == i],
    ),
    "dedup_embedding_cos": (
        "AND a.vec_id < b.vec_id",
        "AND a.vec_id < b.vec_id AND a.vec_id % {n} = {i}",
        lambda df, n, i: df[df["v1"] % n == i],
    ),
    "dedup_embedding_cos_banded": (
        "AND a.vec_id < b.vec_id",
        "AND a.vec_id < b.vec_id AND a.vec_id % {n} = {i}",
        lambda df, n, i: df[df["v1"] % n == i],
    ),
}


# STAGED two-phase comparison (r15): for oracles whose heavy per-id
# work is separable but whose FINAL aggregation is global, a plain
# output slice is unsound — mm_cdc_dedup's `shared` CTE counts distinct
# media per chunk hash across the WHOLE corpus. Phase 1 computes the
# per-media intermediate (`chunks`) one id-residue slice at a time into
# an accumulator table in a file-backed DuckDB (the memory hog is the
# per-byte rolling-hash window, which now holds 1/n of the corpus);
# phase 2 runs the untouched global tail over the accumulated
# intermediate and compares the full output once. The oracle contract
# is untouched — the per-slice SQL is the ORIGINAL prefix with a
# residue predicate injected at the corpus seed, and the tail is the
# original text verbatim.
STAGED_RULES = {
    "mm_cdc_dedup": {
        "site": "FROM documents)",
        "repl": "FROM documents WHERE doc_id % {n} = {i})",
        "split_at": "chunks AS (",      # prefix CTEs run per slice
        "tail_at": "shared AS (",       # global tail runs once
        "slice_select": (
            "SELECT media_id, cid,\n"
            "  md5(string_agg(CAST(b AS VARCHAR), ',' ORDER BY pos)) AS ch,\n"
            "  count(*) AS clen\n"
            "FROM cids GROUP BY media_id, cid"),
    },
}


def connect_views(sf_dir: str, db: str = ":memory:"):
    con = duckdb.connect(db)
    con.execute("PRAGMA temp_directory='/tmp/duckdb_sliced_spill'")
    con.execute(
        f"PRAGMA memory_limit='{os.environ.get('SELFCHECK_MEM', '60GB')}'")
    if "SELFCHECK_THREADS" in os.environ:
        con.execute(f"PRAGMA threads={int(os.environ['SELFCHECK_THREADS'])}")
    if os.environ.get("SELFCHECK_WRITTEN_JOIN_ORDER"):
        con.execute("SET disabled_optimizers='join_order'")
    for t in TABLES:
        # prefer the oracle-only small-row-group copy (scan parallelism)
        src = f"{sf_dir}/oracle/{t}.parquet"
        if not os.path.exists(src):
            src = f"{sf_dir}/{t}.parquet"
        # OR REPLACE: a file-backed accumulator db persists views
        # across the staged mode's per-slice reconnects
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def main_staged(sf_dir: str, out_dir: str, query: str, nslices: int) -> None:
    r = STAGED_RULES[query]
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
    assert r["site"] in sql and r["split_at"] in sql and r["tail_at"] in sql
    prefix = sql[:sql.index(r["split_at"])].rstrip().rstrip(",")
    tail = sql[sql.index(r["tail_at"]):]
    # desync guard (r15 advice): slice_select hand-duplicates the
    # oracle's sliced CTE body — if the oracle ever changes, fail HERE
    # with both texts, not later as a confusing value mismatch.
    body = sql[sql.index(r["split_at"]) + len(r["split_at"]):
               sql.index(r["tail_at"])].rstrip().rstrip(",").rstrip()
    assert body.endswith(")"), f"unexpected CTE shape: ...{body[-40:]!r}"
    body = body[:-1]
    norm = lambda t: " ".join(t.split())
    assert norm(body) == norm(r["slice_select"]), (
        f"STAGED_RULES[{query!r}].slice_select desynchronized from the "
        f"oracle's sliced CTE body:\n--- oracle ---\n{body}\n"
        f"--- rule ---\n{r['slice_select']}")
    # per-process, per-query accumulator path: two concurrent staged
    # runs must not clobber each other's state mid-run (r15 advice)
    db = f"/tmp/duckdb_staged_acc_{query}_{os.getpid()}.duckdb"

    def _rm_acc():
        for p in (db, db + ".wal"):
            if os.path.exists(p):
                os.remove(p)

    _rm_acc()
    # r16 advice: the accumulator db must not outlive a failed/interrupted
    # run (pids recycle, so stale multi-GB files were never reclaimed)
    import atexit
    atexit.register(_rm_acc)
    for i in range(nslices):
        con = connect_views(sf_dir, db)  # fresh per slice: an OOM'd
        # DuckDB process is poisoned (allocator refuses even KB blocks)
        slice_sql = (prefix + "\n" +
                     r["slice_select"]).replace(
            r["site"], r["repl"].format(n=nslices, i=i))
        if i == 0:
            con.execute(f"CREATE TABLE chunks_acc AS {slice_sql}")
        else:
            con.execute(f"INSERT INTO chunks_acc {slice_sql}")
        n = con.sql("SELECT count(*) FROM chunks_acc").fetchone()[0]
        con.close()
        print(f"stage {query} slice {i}/{nslices} (acc {n} rows)",
              flush=True)
    con = connect_views(sf_dir, db)
    oracle = con.sql(
        "WITH chunks AS (SELECT * FROM chunks_acc),\n" + tail).df()
    con.close()
    _rm_acc()
    got = pd.read_parquet(f"{out_dir}/{query}")
    a, b = canon(got), canon(oracle)
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        print(f"FAIL {query}: shape {len(a)}x{list(a.columns)} vs "
              f"{len(b)}x{list(b.columns)}")
        sys.exit(1)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True)
    except AssertionError as e:
        print(f"FAIL {query}: {e}")
        sys.exit(1)
    print(f"PASS {query} ({len(a)} rows, staged over {nslices} slices)")


def main(sf_dir: str, out_dir: str, query: str, nslices: int) -> None:
    if query in STAGED_RULES:
        return main_staged(sf_dir, out_dir, query, nslices)
    site, repl, dump_slice = SLICE_RULES[query]
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
    assert site in sql, f"injection site not found in {query} oracle"
    dump = pd.read_parquet(f"{out_dir}/{query}")
    seen = 0
    for i in range(nslices):
        # fresh connection per slice: bounded, self-cleaning (and the
        # join-order escape hatch + oracle/-copy preference ride along)
        con = connect_views(sf_dir)
        oracle = con.sql(sql.replace(site, repl.format(n=nslices, i=i))).df()
        con.close()
        got = dump_slice(dump, nslices, i)
        a, b = canon(got), canon(oracle)
        if list(a.columns) != list(b.columns) or len(a) != len(b):
            print(f"FAIL {query} slice {i}/{nslices}: shape "
                  f"{len(a)}x{list(a.columns)} vs {len(b)}x{list(b.columns)}")
            sys.exit(1)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {query} slice {i}/{nslices}: {e}")
            sys.exit(1)
        seen += len(a)
        print(f"pass {query} slice {i}/{nslices} ({len(a)} rows)",
              flush=True)
    if seen != len(dump):
        print(f"FAIL {query}: slices cover {seen} rows, dump has {len(dump)}")
        sys.exit(1)
    print(f"PASS {query} ({seen} rows over {nslices} slices)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
