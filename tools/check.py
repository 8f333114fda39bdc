#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: replay oracle_sql.json in DuckDB
over the sf parquet tables and compare against the Spark parquet dumps
written by graft.Verify. Columns sorted by name, rows compared in order,
values compared exactly (timestamps normalized to microseconds).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except Exception:
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).endswith("ndarray'>"):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def driver_sortable(df, name):
    """The driver sorts EVERY query's output with pandas sort_values over
    all columns before hashing — nested cells (arrays/maps/structs) raise
    there. Probe the same operation so the failure shows up locally
    (round-1 lesson: 6 queries passed here but crashed the driver)."""
    try:
        df.sort_values(by=sorted(df.columns))
        return None
    except Exception as e:
        return f"FAIL {name}: NOT DRIVER-SORTABLE (nested output?): {e}"

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, bad = [], []
    # rows-only queries (no oracle): still must load and driver-sort
    import os
    dumped = sorted(d for d in os.listdir(out)
                    if os.path.isdir(os.path.join(out, d)))
    for name in dumped:
        if name in oracle or (only and name not in only):
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df())
        except Exception as e:
            bad.append(name); print(f"FAIL {name}: SPARK OUTPUT UNREADABLE: {e}"); continue
        err = driver_sortable(got, name)
        if err:
            bad.append(name); print(err)
        else:
            ok.append(name); print(f"ok   {name} ({len(got)} rows, rows-only)")
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            bad.append(name); print(f"FAIL {name}: ORACLE ERROR: {e}"); continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df())
        except Exception as e:
            bad.append(name); print(f"FAIL {name}: SPARK OUTPUT MISSING: {e}"); continue
        err = driver_sortable(got, name)
        if err:
            bad.append(name); print(err); continue
        if list(exp.columns) != list(got.columns):
            bad.append(name)
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            continue
        if len(exp) != len(got):
            bad.append(name)
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            continue
        # the driver's hash is DTYPE-KIND-sensitive (round-6 lesson:
        # pipeline_pack_batches matched every value but DuckDB HUGEINT →
        # pandas float64 vs Spark int64 flipped the hash, while int32 vs
        # int64 rows passed all six rounds) — flag kind mismatches (int vs
        # float vs object) before comparing values
        def kind(d):
            k = d.kind
            return "i" if k == "u" else k
        dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
              if kind(exp[c].dtype) != kind(got[c].dtype)]
        if dt:
            bad.append(name)
            c, de, dg = dt[0]
            print(f"FAIL {name}: DTYPE col={c} oracle={de} spark={dg}")
            continue
        diff = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cell_eq(a, b):
                    diff = (c, i, a, b)
                    break
            if diff:
                break
        if diff:
            c, i, a, b = diff
            bad.append(name)
            near = ""
            if isinstance(a, float) and isinstance(b, float) and abs(a - b) < 1e-6:
                near = " [FLOAT-NEAR]"
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}{near}")
        else:
            ok.append(name)
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{len(ok)} ok, {len(bad)} FAIL" + (": " + " ".join(bad) if bad else ""))
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
