#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, compare to the Verify parquet dumps
(columns sorted by name, rows sorted, values canonicalized).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [timeoutSecPerQuery]

The optional per-query timeout (default: none) interrupts a DuckDB
oracle that runs away at large synthesized scale factors (the oracle
twins of banded/bucketed operators are deliberately quadratic
anti-baselines — q206's theta join, q36's composed as-of) and records
the query as TIMEOUT instead of hanging the whole sweep.
"""
import sys, json, glob, math, threading, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def check_sortable(df: pd.DataFrame) -> None:
    """The driver's harness sorts RAW values; a nested-type column
    (ndarray/list cells) crashes its pandas sort_values (round-4 q115
    lesson). Reject such outputs here so the local gate catches them
    even though canon() below could serialize them."""
    if not len(df):
        return
    for c in df.columns:
        v = df[c].iloc[0]
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            raise TypeError(
                f"column {c!r} holds nested values — driver harness cannot sort it")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    check_sortable(df)
    df = df.reindex(sorted(df.columns), axis=1)

    def canon_val(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (list,)):
            return json.dumps([canon_val(x) for x in v])
        return str(v)

    out = df.map(canon_val)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def run_with_timeout(con, sql: str, timeout_sec):
    """Execute on `con`, interrupting after timeout_sec (None = never).
    Raises TimeoutError on interrupt."""
    if not timeout_sec:
        return con.execute(sql).df()
    fired = threading.Event()

    def watchdog():
        if not fired.wait(timeout_sec):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        df = con.execute(sql).df()
        fired.set()
        return df
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle exceeded {timeout_sec}s")
    finally:
        fired.set()


def main(sf_dir: str, out_dir: str, timeout_sec=None) -> None:
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. the SynthScale sf1 dir) are parquet
        # DIRECTORIES; DuckDB needs the part-file glob for those.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            t0 = time.time()
            exp = canon(run_with_timeout(con, sql, timeout_sec))
            if time.time() - t0 > 30:
                print(f"  [slow oracle] {name}: {time.time() - t0:.0f}s")
        except TimeoutError as e:
            print(f"TIMEOUT {name}: {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            diff = (got != exp).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print("   spark:", dict(got.loc[i]))
                print("   duck :", dict(exp.loc[i]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else None)
