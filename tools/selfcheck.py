#!/usr/bin/env python3
"""Dev-time self-check: mimic the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB
(with each fixture parquet registered as a view) and compares against the
engine's parquet dump, after sorting rows and columns by name. Reports
per-query PASS/FAIL with diffs. This is NOT part of the shipped library —
it only de-risks t2 before the driver runs the real gate.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "tolist") and not pd.api.types.is_scalar(v)).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                if v is not None and not pd.api.types.is_scalar(v) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    # An in-memory connection has no temp directory, so out-of-core
    # operators cannot spill: the heaviest oracles (IVF ingest at the
    # 10x synth_scale fixture) OOM-killed the process at ~109 GB RSS.
    # A temp dir + a cap below box RAM turns that into disk spill.
    import os
    con.execute(f"PRAGMA temp_directory='{os.environ.get('SELFCHECK_TMP', '/tmp/duckdb_selfcheck_spill')}'")
    # Default cap: min(48GB, ~75% of box RAM). A flat 48GB would RAISE
    # DuckDB's own default (~80% of RAM) on boxes under ~60 GB and turn
    # previously-safe runs into OOM-kill candidates (r10 advice).
    if "SELFCHECK_MEM" in os.environ:
        mem = os.environ["SELFCHECK_MEM"]
    else:
        ram_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                  ) / (1 << 30)
        mem = f"{min(48, max(1, int(ram_gb * 0.75)))}GB"
    con.execute(f"PRAGMA memory_limit='{mem}'")
    # Optional thread cap so an hours-long 10x compare can share the box
    # with engine work (default: DuckDB uses every core).
    if "SELFCHECK_THREADS" in os.environ:
        con.execute(f"PRAGMA threads={int(os.environ['SELFCHECK_THREADS'])}")
    # SELFCHECK_WRITTEN_JOIN_ORDER=1: execute joins in the oracles'
    # written order. At the 10x densification fixture DuckDB's join-order
    # optimizer pairs the two flat (vec_id, e, pos) relations on pos
    # ALONE before the candidate relation - a 2.6e10-row intermediate
    # that OOM'd 100GB RAM + 80GB spill - while the written order
    # (candidates first, then the two vector fetches) runs the same
    # query in seconds. Purely an evaluation-harness knob: results are
    # plan-independent.
    if os.environ.get("SELFCHECK_WRITTEN_JOIN_ORDER"):
        con.execute("SET disabled_optimizers='join_order'")
    for t in TABLES:
        # synth_scale writes an oracle-only small-row-group copy under
        # oracle/ (scan parallelism for the heavy all-pairs oracles)
        # while the engine-facing file keeps default row groups —
        # prefer the oracle copy when present (same values either way)
        src = f"{sf_dir}/oracle/{t}.parquet"
        if not os.path.exists(src):
            src = f"{sf_dir}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            a, b = canon(got), canon(oracle)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs oracle {list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs oracle {len(b)}")
                n_fail += 1
                continue
            # The driver's hash normalizes integer WIDTHS (int32 vs int64
            # both passed CORRECTNESS_r02) but not KINDS (an int column
            # vs DuckDB HUGEINT->float64 failed it). Flag kind changes.
            dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype))
                           for c in a.columns
                           if a[c].dtype.kind != b[c].dtype.kind]
            if dt_mismatch:
                print(f"FAIL {name}: dtype KIND mismatch (flips the "
                      "driver's byte-level hash): " +
                      "; ".join(f"{c}: spark {x} vs oracle {y}"
                                for c, x, y in dt_mismatch))
                n_fail += 1
                continue
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                # check_exact uses ==, which calls -0.0 == 0.0 equal; the
                # driver's hash is byte-level and does NOT. Re-compare
                # float columns bitwise.
                import numpy as np
                bitdiff = []
                for c in a.columns:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    if av.dtype.kind == "f" and bv.dtype.kind == "f":
                        ab = av.astype("f8").view("u8")
                        bb = bv.astype("f8").view("u8")
                        nd = int((ab != bb).sum())
                        if nd:
                            i = int(np.nonzero(ab != bb)[0][0])
                            bitdiff.append((c, nd, av[i], bv[i]))
                if bitdiff:
                    print(f"BITDIFF {name}: == equal but bytes differ: " +
                          "; ".join(f"{c}: {nd} rows e.g. {x!r} vs {y!r}"
                                    for c, nd, x, y in bitdiff))
                    n_fail += 1
                    continue
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
            except AssertionError as e:
                # retry with tolerance to show whether it's an FP-only diff
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                                  check_exact=False, rtol=1e-9)
                    print(f"FP-ONLY-DIFF {name}: exact hash would fail; "
                          f"values equal to 1e-9")
                except AssertionError:
                    print(f"FAIL {name}: {str(e)[:300]}")
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
