#!/usr/bin/env python3
"""Local replay of the driver's t2 correctness gate (SURVEY.md §5.4).

Usage: python3 tools/preverify.py <sfDir> <outDir> [--bitexact] [query ...]

--bitexact compares float cells by their IEEE-754 bits (catches -0.0 and
last-bit drift a hash compare would) instead of the round-to-9-decimals
default. Round-1 state: all 90 oracle queries pass bit-exact.

Reads <outDir>/oracle_sql.json (written by graft.Verify), attaches every
table in <sfDir> as a same-named DuckDB view, runs each oracle SQL, and
compares the result to the engine's parquet at <outDir>/<name>/ — columns
sorted by name, values compared cell-by-cell after dtype normalization.

Exit code 0 iff every query matches.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
BITEXACT = False

# Output dtypes with DRIVER-GREEN precedent: the exact set of DuckDB types
# appearing across the 203 queries that passed the driver's gate in round
# 12 (computed from CORRECTNESS_r12.json x /tmp/vout parquet schemas).
# Anything else is driver-UNPROVEN: round 12's q1_decimal emitted
# DECIMAL(38,_) columns, passed this local replay with value-identical
# rows, and still hash-failed at the driver (decimal stringification /
# version drift in its pandas comparator) — the local gate must never
# again certify a dtype the driver has no precedent on.
PROVEN_DTYPES = {"BIGINT", "BOOLEAN", "DATE", "DOUBLE", "INTEGER",
                 "TIMESTAMP", "VARCHAR"}


def unproven_cols(cols, types):
    return [(c, t) for c, t in zip(cols, types) if t not in PROVEN_DTYPES]


def norm_cell(v):
    """Normalize a cell for comparison across duckdb/parquet dtypes."""
    if v is None:
        return None
    if isinstance(v, float):
        if BITEXACT:
            return struct.pack("d", v)
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def nested_cols(cols, types):
    """Columns the driver's pandas comparator cannot hash (sort_values →
    Categorical dies on numpy.ndarray/dict). Any LIST/STRUCT/MAP output
    column WILL fail the driver even if values match — reject it here."""
    return [c for c, t in zip(cols, types)
            if "[]" in t or t.startswith(("STRUCT", "MAP"))]


def fetch_norm(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    types = [str(t) for t in cur.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = cur.fetchall()
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(norm_cell(r[i]) for i in order) for r in rows])


def main():
    global BITEXACT
    args = [a for a in sys.argv[1:] if a != "--bitexact"]
    BITEXACT = "--bitexact" in sys.argv
    sf_dir, out_dir = Path(args[0]), Path(args[1])
    only = set(args[2:])
    marker = out_dir / "PARTIAL_SUBSET_DUMP"
    if marker.exists():
        refreshed = marker.read_text().split()
        print(f"WARNING: {out_dir} is a PARTIAL dump — graft.Verify last "
              f"refreshed only {refreshed}; results for other queries replay "
              "STALE parquet from an older run. Re-run Verify with no subset "
              "for a full gate.")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    # Oracle SQLs are self-contained against the t2 dir (sf0.01); rewrite the
    # embedded read_parquet paths when replaying at another scale factor.
    oracle = {k: v.replace("/root/testdata/sf0.01", str(sf_dir)) for k, v in oracle.items()}
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"FAIL {name}: engine output missing at {res_dir}")
            n_fail += 1
            continue
        try:
            ocols, otypes, orows = fetch_norm(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            ecols, etypes, erows = fetch_norm(con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: engine parquet read error: {e}")
            n_fail += 1
            continue
        nested = sorted(set(nested_cols(ocols, otypes)) | set(nested_cols(ecols, etypes)))
        if nested:
            print(f"FAIL {name}: array/struct/map output column(s) {nested} — "
                  "the driver's pandas comparator crashes on these; stringify "
                  "(array_join / array_to_string) on both sides")
            n_fail += 1
            continue
        unproven = sorted(set(unproven_cols(ocols, otypes))
                          | set(unproven_cols(ecols, etypes)))
        if unproven:
            print(f"FAIL {name}: driver-UNPROVEN output dtype(s) {unproven} — "
                  "only " + "/".join(sorted(PROVEN_DTYPES)) + " have driver-"
                  "green precedent; a value-identical local pass does not "
                  "certify these (q1_decimal r12: local pass, driver hash "
                  "fail on DECIMAL). Cast to a proven dtype on both sides")
            n_fail += 1
            continue
        if ocols != ecols:
            print(f"FAIL {name}: column mismatch oracle={ocols} engine={ecols}")
            n_fail += 1
            continue
        if otypes != etypes:
            diff = [(c, o, e) for c, o, e in zip(ocols, otypes, etypes) if o != e]
            print(f"FAIL {name}: dtype mismatch (col, oracle, engine): {diff}")
            n_fail += 1
            continue
        if len(orows) != len(erows):
            print(f"FAIL {name}: row count oracle={len(orows)} engine={len(erows)}")
            n_fail += 1
            continue
        bad = [(i, o, e) for i, (o, e) in enumerate(zip(orows, erows)) if o != e]
        if bad:
            i, o, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:\n  oracle {o}\n  engine {e}\n  cols   {ocols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
