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


def main(sf_dir: str, out_dir: str, query: str, nslices: int) -> None:
    site, repl, dump_slice = SLICE_RULES[query]
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
    assert site in sql, f"injection site not found in {query} oracle"
    dump = pd.read_parquet(f"{out_dir}/{query}")
    seen = 0
    for i in range(nslices):
        con = duckdb.connect()  # fresh per slice: bounded, self-cleaning
        con.execute("PRAGMA temp_directory='/tmp/duckdb_sliced_spill'")
        con.execute(f"PRAGMA memory_limit='{os.environ.get('SELFCHECK_MEM', '60GB')}'")
        if "SELFCHECK_THREADS" in os.environ:
            con.execute(f"PRAGMA threads={int(os.environ['SELFCHECK_THREADS'])}")
        # mirror selfcheck.py's escape hatch for DuckDB join-order
        # mis-plans (r13 advice): a slice can hit the same planner trap
        # as the monolithic run
        if os.environ.get("SELFCHECK_WRITTEN_JOIN_ORDER"):
            con.execute("SET disabled_optimizers='join_order'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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
