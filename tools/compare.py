#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff values.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

(Local dev tool only — the shipped Scala library does not depend on this.)
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def strict_hash(df: pd.DataFrame) -> str:
    """Replica of the driver-style hash: order- and representation-
    sensitive.  Columns sorted by name, rows in MATERIALIZED order (no
    canonical row sort), each cell contributing its dtype kind and exact
    string/repr form.  canon() deliberately hides this whole failure
    class (row-order and dtype drift between engines); this does not.
    """
    import hashlib

    h = hashlib.sha256()
    cols = sorted(df.columns)
    for c in cols:
        h.update(f"{c}:{df[c].dtype}|".encode())
    for row in df[cols].itertuples(index=False, name=None):
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                h.update(b"<null>;")
            elif isinstance(v, float):
                h.update(repr(v).encode() + b";")
            else:
                h.update(str(v).encode() + b";")
    return h.hexdigest()[:16]


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return str(a) == str(b)


def main(out_dir: str, sf_dir: str) -> int:
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    for missing in sorted(set(oracles) - set(names)):
        print(f"FAIL {missing}: declared oracle but no spark output written")
        failed.append(missing)
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failed.append(name)
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failed.append(name)
            continue
        bad = 0
        first = None
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not values_equal(a, b):
                    bad += 1
                    if first is None:
                        first = (col, i, a, b)
        if bad:
            print(f"FAIL {name}: {bad} value mismatches; first={first}")
            failed.append(name)
        else:
            sh, dh = strict_hash(spark_df), strict_hash(duck_df)
            if sh != dh:
                # values agree under canonical sort but the materialized
                # order/representation differs — exactly the class the
                # driver's hash_match keys on (pack_boundaries r10)
                sd = dict(zip(sorted(spark_df.columns),
                              [str(spark_df[c].dtype) for c in sorted(spark_df.columns)]))
                dd = dict(zip(sorted(duck_df.columns),
                              [str(duck_df[c].dtype) for c in sorted(duck_df.columns)]))
                detail = "dtypes " + str({k: (sd[k], dd[k]) for k in sd if sd[k] != dd[k]}) \
                    if sd != dd else "row order"
                print(f"STRICT-MISMATCH {name}: spark={sh} duck={dh} ({detail})")
                failed.append(name)
            else:
                print(f"OK   {name}: rows={len(s)} cols={len(s.columns)} hash={sh}")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
