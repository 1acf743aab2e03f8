"""Driver-style correctness harness: run every queries() entry at a given
sf_dir and compare row count + sorted values against the DuckDB oracle.

Usage: python tools/check_oracles.py [sf_dir] [name ...]

Importable surface (used by tests/test_contract_sweep.py so the sweep
can't rot out of the committed validation): ``oracle_connection(sf_dir)``
and ``check_entry(name, sf_dir, con, qs, oracles)``.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def oracle_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_entry(name: str, sf_dir: str, con, qs, oracles):
    """Run ONE contract entry → (status, detail). status ∈
    {"pass", "rows-only", "fail"}; detail is the failure message or the
    row count."""
    fn = qs[name]
    try:
        got = normalize(to_pandas(fn(sf_dir)))
    except Exception as e:
        return "fail", f"engine raised {type(e).__name__}: {e}"
    if name not in oracles:
        return "rows-only", f"{len(got)} rows"
    try:
        exp = normalize(con.sql(oracles[name]).df())
    except Exception as e:
        return "fail", f"oracle SQL raised {e}"
    if list(got.columns) != list(exp.columns):
        return "fail", f"columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return "fail", f"rows {len(got)} != {len(exp)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0)
        else:
            eq = (a == b).all()
        if not eq:
            bad = got[c].to_numpy() != exp[c].to_numpy()
            i = int(np.nonzero(bad)[0][0])
            return "fail", (
                f"column {c} differs at sorted row {i}: "
                f"got {got.iloc[i].to_dict()} exp {exp.iloc[i].to_dict()}"
            )
    return "pass", f"{len(got)} rows"


def main():
    import ray

    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = oracle_connection(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    record = {}
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        status, detail = check_entry(name, sf_dir, con, qs, oracles)
        dt = time.perf_counter() - t0
        record[name] = {"status": status, "detail": detail, "sec": round(dt, 2)}
        if status == "fail":
            print(f"FAIL {name}: {detail}")
            n_fail += 1
        elif status == "rows-only":
            print(f"rows-only {name}: {detail}  ({dt:.1f}s)")
            n_rowsonly += 1
        else:
            print(f"PASS {name}: {detail}  ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "fail": n_fail,
                    "rows_only": n_rowsonly,
                    "entries": record,
                },
                f,
                indent=1,
            )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
