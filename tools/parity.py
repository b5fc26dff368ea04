#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY §3.1).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [key ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same source tables, and
compares result sets with columns sorted by name (the driver sorts columns
by name before hashing). Exits nonzero if any declared key mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if type(v).__name__ == "Decimal":
        return float(v)
    return v


def array_cols(rows):
    """The driver's t2 gate sorts columns with pandas, which crashes on
    array-typed cells (unhashable numpy.ndarray). Mirror that limitation:
    any list-valued cell is a hard local failure BEFORE key declaration.
    Scans EVERY row (cheap at sf0.01): a column whose leading cells are
    NULL would slip past a sampled check and diverge from the driver."""
    bad = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple)):
                bad.add(i)
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failed, passed = [], []
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        try:
            scon = duckdb.connect()
            sres = scon.execute(
                f"SELECT * FROM '{out_dir}/{key}/*.parquet'")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()

            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failed.append(key)
            print(f"FAIL {key}: exec error: {e}")
            continue

        bad = array_cols(srows) | array_cols(orows)
        if bad:
            failed.append(key)
            names = sorted({scols[i] if i < len(scols) else str(i) for i in bad})
            print(f"FAIL {key}: array-typed result columns {names} — "
                  "the driver's pandas-based gate cannot hash these; "
                  "serialize with array_join/array_to_string")
            continue
        if sorted(scols) != sorted(ocols):
            failed.append(key)
            print(f"FAIL {key}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        # Driver-faithful dtype check: the driver hashes PANDAS frames, and
        # duckdb->pandas dtype conversions differ from fetchall's python
        # objects (e.g. HUGEINT -> float64, so an oracle sum(BIGINT) hashed
        # as `...95.0` against Spark's int64 `...95` and failed r2's g15
        # while this fetchall-based gate passed). Compare dtype KINDS
        # (int/uint vs float vs bool vs object) per column name.
        try:
            skinds = {c: d.kind for c, d in scon.execute(
                f"SELECT * FROM '{out_dir}/{key}/*.parquet'").df().dtypes.items()}
            okinds = {c: d.kind for c, d in con.execute(sql).df().dtypes.items()}
            num = {"i": "i", "u": "i"}  # int vs uint: same hash text
            kind_bad = [c for c in scols
                        if num.get(skinds[c], skinds[c]) != num.get(okinds[c], okinds[c])]
        except Exception:
            kind_bad = []  # pandas conversion itself failed: fall through
        if kind_bad:
            failed.append(key)
            print(f"FAIL {key}: pandas dtype kind mismatch "
                  + ", ".join(f"{c}: spark={skinds[c]} oracle={okinds[c]}"
                              for c in kind_bad))
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        s = [tuple(norm(r[i]) for i in sidx) for r in srows]
        o = [tuple(norm(r[i]) for i in oidx) for r in orows]
        if len(s) != len(o):
            failed.append(key)
            print(f"FAIL {key}: rowcount spark={len(s)} oracle={len(o)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b]
        if bad:
            failed.append(key)
            i, a, b = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(s)} rows differ; first at {i}:")
            print(f"  cols   {sorted(scols)}")
            print(f"  spark  {a}")
            print(f"  oracle {b}")
        else:
            passed.append(key)
            print(f"ok   {key} ({len(s)} rows)")

    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
