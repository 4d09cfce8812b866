"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against oracle_sql() with the driver's protocol (rows, schema,
sorted-column value hash)."""
import hashlib
import json
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

ray.init(address="local", num_cpus=8, include_dashboard=False)
import ray.data as rd

rd.DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def to_df(res):
    import pyarrow as pa

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    df = norm(df)
    payload = df.to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main():
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
        except Exception:
            pass

    qs = E.queries()
    oracles = E.oracle_sql()
    out = {}
    for i, (name, fn) in enumerate(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            mine = to_df(fn(SF))
        except Exception as ex:
            out[name] = {"err": f"query raised: {ex!r}"[:300]}
            print(i, name, "QUERY-ERR", repr(ex)[:200], flush=True)
            continue
        if name not in oracles:
            out[name] = {"rows": len(mine), "oracle": None}
            print(i, name, "no_oracle rows=", len(mine), f"{time.time()-t0:.1f}s", flush=True)
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            out[name] = {"err": f"oracle raised: {ex!r}"[:300]}
            print(i, name, "ORACLE-ERR", repr(ex)[:200], flush=True)
            continue
        rows_ok = len(mine) == len(want)
        schema_ok = sorted(mine.columns) == sorted(want.columns)
        hash_ok = schema_ok and vhash(mine) == vhash(want)
        out[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                     "hash_match": hash_ok, "mine": len(mine), "want": len(want)}
        flag = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(i, name, flag, len(mine), len(want), f"{time.time()-t0:.1f}s", flush=True)
        if flag == "FAIL":
            print("   mine cols:", list(mine.columns), flush=True)
            print("   want cols:", list(want.columns), flush=True)
    bad = {k: v for k, v in out.items() if v.get("hash_match") is False or "err" in v}
    print(json.dumps({"total": len(out), "bad": bad}, default=str)[:4000], flush=True)


main()
ray.shutdown()
