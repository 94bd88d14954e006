"""Local replica of the driver's correctness check: run each queries() entry
and its oracle_sql() twin at a given sf, compare row count + schema + an
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _deep_tuple(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_deep_tuple(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(col.dropna().iloc[0] if col.dropna().size else None, (list, np.ndarray)):
            df[c] = col.map(lambda v: _deep_tuple(v) if v is not None else None)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64", errors="ignore")
        elif col.dtype.kind == "f":
            # pyarrow and DuckDB ROUND land on doubles 1 ULP apart for ~2% of
            # values; re-rounding maps both to the same double so the row
            # SORT aligns across engines (the value compare has atol anyway)
            df[c] = np.round(col.astype(float), 6)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the representation class the driver's
    value hash is sensitive to: signed/unsigned ints render identically
    (1234), but int vs float (1234 vs 1234.0) hash-differ — the exact
    failure mode of r4's q_linear_score (HUGEINT oracle -> float64)."""
    k = dtype.kind
    return "i" if k == "u" else k


def compare(name, mine: pd.DataFrame, orc: pd.DataFrame) -> str:
    if len(mine) != len(orc):
        return f"ROWS {len(mine)} vs {len(orc)}"
    if sorted(mine.columns) != sorted(orc.columns):
        return f"COLS {sorted(mine.columns)} vs {sorted(orc.columns)}"
    # driver-strict: the driver hashes rendered values, so int64 1234 vs
    # float64 1234.0 FAILS there even when values are equal — assert dtype
    # kind equality before the (dtype-forgiving) value compare
    for c in sorted(mine.columns):
        ka, kb = _kind(mine[c].dtype), _kind(orc[c].dtype)
        if ka != kb:
            return f"DTYPE col {c}: {mine[c].dtype} vs {orc[c].dtype} (driver hash would differ)"
    a, b = normalize(mine), normalize(orc)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            ok = np.isclose(aa, bb, rtol=0, atol=1e-9, equal_nan=True) | (np.isnan(aa) & np.isnan(bb))
            if not ok.all():
                i = int(np.nonzero(~ok)[0][0])
                return f"VAL col {c} row {i}: {aa[i]!r} vs {bb[i]!r}"
        else:
            eq = (av.fillna("\x00NULL") == bv.fillna("\x00NULL")) if av.dtype == object else (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = int(np.nonzero(~eq.to_numpy())[0][0])
                return f"VAL col {c} row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import logging

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True, logging_level=logging.ERROR)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = f"QUERY ERROR: {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(mine)} rows, {round(time.time()-t0,1)}s)"
            continue
        try:
            orc = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {str(e)[:200]}"
            continue
        results[name] = compare(name, mine, orc) + f" ({len(mine)} rows, {round(time.time()-t0,1)}s)"
    ray.shutdown()
    if not results:
        print("no queries matched the filter "
              "(usage: check_oracle.py [sf_dir] [query_name ...])")
        sys.exit(2)
    width = max(len(k) for k in results)
    fails = 0
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
        if not (v.startswith("OK") or v.startswith("rows-only")):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} clean")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
