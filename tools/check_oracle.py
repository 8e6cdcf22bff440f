"""Local replica of the graft driver's correctness gate.

Usage: python tools/check_oracle.py [query-name-substring ...]

Simulates the driver: ray.init FIRST, import __ray_entry__, run entry(),
then every queries() callable at sf0.01 vs its oracle_sql() in DuckDB
(testdata parquet registered as views). Compare = sort columns by name,
round floats to 6dp, sort rows, hash. Prints one line per query and a
final ok/bad tally; exit code 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha1(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()[:16]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main() -> int:
    filters = sys.argv[1:]
    first_n = None
    if "--first" in filters:
        i = filters.index("--first")
        first_n = int(filters[i + 1])
        filters = filters[:i] + filters[i + 2 :]
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, log_to_driver=False)
    import __ray_entry__ as e

    ent = e.entry()
    print(f"entry(): {len(to_df(ent))} rows ok")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    if first_n is not None:
        qs = dict(list(qs.items())[:first_n])
    ok = bad = skipped = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.monotonic()
        try:
            mine = canon(to_df(fn(SF_DIR)))
        except Exception as ex:
            print(f"  {name}: ENGINE ERROR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        if name not in os_:
            print(f"  {name}: rows={len(mine)} (no oracle) [{time.monotonic()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            orc = canon(con.execute(os_[name]).fetchdf())
        except Exception as ex:
            print(f"  {name}: ORACLE ERROR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        rows = len(mine) == len(orc)
        schema = list(mine.columns) == list(orc.columns)
        h = value_hash(mine) == value_hash(orc) if rows and schema else False
        status = "ok" if (rows and schema and h) else "BAD"
        schema_msg = "ok" if schema else f"{list(mine.columns)} vs {list(orc.columns)}"
        print(
            f"  {name}: {status} rows={len(mine)}/{len(orc)} "
            f"schema={schema_msg} "
            f"hash={'ok' if h else 'MISMATCH'} [{time.monotonic()-t0:.1f}s]"
        )
        if status == "ok":
            ok += 1
        else:
            bad += 1
    print(f"== {ok} ok / {bad} bad / {skipped} no-oracle ==")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
