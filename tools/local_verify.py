#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a CORRECTNESS-style JSON (per-query
rows/schema/hash match flags) — the sf1 rehearsal artifact format.

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same scale-factor tables, and compares: schema (column names), row
count, and a hash over the value matrix with columns sorted by name and
rows sorted canonically — the same normalization the driver describes.
"""
import json
import math
import os
import sys
import threading
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Same normalization as the original per-cell itertuples loop
    (floats rounded to 9 decimals, NaN -> "NaN", timestamps -> iso
    strings, array cells -> tuples; rows sorted by the stringified
    tuple), but vectorized per column — the row loop was 50x the
    DuckDB cost on multi-million-row 10x-rehearsal results."""
    df = df.reindex(sorted(df.columns), axis=1)
    cols = {}
    for c in df.columns:
        s = df[c]
        k = s.dtype.kind
        if k == "f":
            r = s.round(9).astype(object)
            r[s.isna()] = "NaN"
            cols[c] = r
        elif k == "M":
            cols[c] = s.map(lambda v: v if v is pd.NaT else v.isoformat())
        elif k == "O":
            cols[c] = s.map(_norm_cell)
        else:
            cols[c] = s
    out = pd.DataFrame(cols)[list(df.columns)] if len(df.columns) else df
    if len(out) == 0:
        return out
    key = out.astype(str)
    order = key.sort_values(by=list(out.columns), kind="stable").index
    return out.loc[order].reset_index(drop=True)


def _use_dbhash(result_dir: Path) -> bool:
    """Large results skip the pandas canon (its in-memory sort was the
    100x-rehearsal bottleneck, not either engine) and compare inside
    DuckDB instead. BIGHASH_MIN_MB sets the spark-parquet size cutoff;
    unset disables the fast path (the driver-identical default)."""
    lim = os.environ.get("BIGHASH_MIN_MB")
    if not lim:
        return False
    size = sum(f.stat().st_size for f in result_dir.rglob("*") if f.is_file())
    return size >= float(lim) * 1024 * 1024


def _canon_expr(col: str, typ: str) -> str:
    """Canonical per-column expression, applied IDENTICALLY to the
    spark result and the oracle subquery, mirroring the pandas canon:
    doubles rounded to 9 decimals (+0.0 collapses -0.0), float lists
    element-rounded, timestamps as strings. Both sides run the same
    DuckDB functions, so engine-side ulp noise below 1e-9 cancels
    exactly as in the pandas path. NaN folds to NULL: the pandas canon
    stringifies both NULL and NaN floats as 'NaN', while hash()
    distinguishes them — without the fold a NULL-vs-NaN disagreement
    would flip verdict with the compare mode (ADVICE r12)."""
    q = f'"{col}"'
    t = typ.upper()
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        return (f"(CASE WHEN {q} IS NULL OR isnan(CAST({q} AS DOUBLE)) "
                f"THEN NULL ELSE round(CAST({q} AS DOUBLE), 9) + 0.0 END)")
    # widen every integer kind to BIGINT: hash() is width-sensitive,
    # and the pandas path compares 42::INT == 42::BIGINT as equal
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return f"CAST({q} AS BIGINT)"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return f"CAST({q} AS VARCHAR)"
    if t in ("DOUBLE[]", "FLOAT[]", "REAL[]"):
        return (f"CAST(list_transform({q}, "
                f"v -> round(CAST(v AS DOUBLE), 9) + 0.0) AS VARCHAR)")
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return f"CAST({q} AS VARCHAR)"
    return q


def compare_dbhash(con, name, result_dir: Path, sql: str, overrides,
                   results, detail, flush_detail):
    """Order-independent multiset compare in DuckDB: per-row 64-bit
    hash over the canonicalized columns (sorted by name), reduced by
    count + sum + xor. Identical reduction on both sides; a mismatch
    in any of the three is a fail, agreement in all three is the
    multiset-equality verdict (collision odds ~2^-64 per pair)."""
    import threading as _t
    timeout = overrides.get(
        name, float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0))
    pattern = f"{result_dir}/*.parquet" if result_dir.is_dir() else str(result_dir)
    sv = f"SELECT * FROM read_parquet('{pattern}')"

    def schema_of(q):
        return [(r[0], r[1]) for r in con.execute(f"DESCRIBE {q}").fetchall()]

    def digest(q, cols_types):
        exprs = [_canon_expr(c, t) for c, t in
                 sorted(cols_types, key=lambda x: x[0])]
        h = f"hash({', '.join(exprs)})"
        row = con.execute(
            f"SELECT count(*), sum(CAST({h} AS HUGEINT)), bit_xor({h}) "
            f"FROM ({q})").fetchone()
        return row

    timer = None
    timed_out = _t.Event()
    if timeout > 0:
        def _interrupt():
            timed_out.set()
            con.interrupt()
        timer = _t.Timer(timeout, _interrupt)
        timer.start()
    try:
        s_schema = schema_of(sv)
        o_schema = schema_of(f"({sql})")
        d = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None,
             "mode": "dbhash"}
        if sorted(c for c, _ in s_schema) != sorted(c for c, _ in o_schema):
            d["err"] = (f"SCHEMA-MISMATCH spark={sorted(c for c, _ in s_schema)} "
                        f"duck={sorted(c for c, _ in o_schema)}")
            results[name] = d["err"]
        else:
            d["schema_match"] = True
            sc, sh, sx = digest(sv, s_schema)
            oc, oh, ox = digest(f"({sql})", o_schema)
            d["spark_rows"], d["oracle_rows"] = int(sc), int(oc)
            d["rows_match"] = sc == oc
            d["hash_match"] = d["rows_match"] and sh == oh and sx == ox
            if not d["rows_match"]:
                results[name] = f"ROWCOUNT-MISMATCH spark={sc} duck={oc}"
            elif not d["hash_match"]:
                results[name] = f"VALUE-MISMATCH dbhash sum/xor differ ({sc} rows)"
            else:
                results[name] = f"OK rows={sc} (dbhash)"
    except Exception as e:
        kind = "ORACLE-TIMEOUT" if timed_out.is_set() else "ORACLE-ERROR"
        results[name] = f"{kind} {e}"
        d = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None,
             "err": f"{kind}: {str(e)[:300]}", "mode": "dbhash"}
    finally:
        if timer is not None:
            timer.cancel()
    detail[name] = d
    flush_detail()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # ORACLE_MEM_LIMIT (e.g. "24GB") bounds DuckDB so a scale-rehearsal
    # oracle that outgrows RAM records ORACLE-ERROR instead of taking
    # the whole compare process down with a raw MemoryError (observed:
    # the iterated graph CTEs at the 100x replica). Unset = DuckDB
    # default (the driver-identical behavior).
    mem = os.environ.get("ORACLE_MEM_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        # per-process spill dir: concurrent local_verify processes on
        # one shared dir delete each other's temp files mid-query and
        # DuckDB aborts the whole process
        con.execute(
            f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        # driver testdata tables are single parquet FILES; tool-built
        # replicas (tools/ScaleUp) are Spark parquet DIRECTORIES
        path = Path(sf_dir, f"{t}.parquet")
        pattern = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    json_out = Path(sys.argv[3]) if len(sys.argv) > 3 else None

    results = {}
    # resume support for long scale-rehearsal runs: with a jsonOut
    # that already exists, queries with a recorded verdict are kept
    # and skipped (delete the file for a fresh run)
    detail = {}
    if json_out is not None and json_out.exists():
        detail = json.loads(json_out.read_text())
        for k, v in detail.items():
            ok = v.get("rows_match") and v.get("schema_match") \
                and v.get("hash_match")
            results[k] = (f"OK rows={v['spark_rows']} (resumed)" if ok
                          else f"PRIOR-FAIL {str(v.get('err'))[:80]}")

    def flush_detail():
        if json_out is not None:
            json_out.write_text(json.dumps(detail, indent=1, sort_keys=True))

    # VERIFY_ONLY=name1,name2 restricts the compare — the parallel-
    # rehearsal aid (several local_verify processes, disjoint query
    # sets, merged jsonOuts). Unset = all (the driver-identical default).
    only = os.environ.get("VERIFY_ONLY")
    only = set(x.strip() for x in only.split(",")) if only else None
    # ORACLE_TIMEOUT_OVERRIDES="g_triangles=1800,q_geo_knn=900" gives
    # named heavyweight oracles their own budget at scale rehearsals.
    overrides = {}
    for kv in (os.environ.get("ORACLE_TIMEOUT_OVERRIDES") or "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            overrides[k.strip()] = float(v)

    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        if name in detail or (only is not None and name not in only):
            continue
        print(f".. {name}", flush=True)
        if name in oracle and _use_dbhash(Path(out_dir, name)):
            compare_dbhash(con, name, Path(out_dir, name), oracle[name],
                           overrides, results, detail, flush_detail)
            continue
        spark_df = pd.read_parquet(Path(out_dir, name))
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        # ORACLE_TIMEOUT_SEC bounds each DuckDB oracle run (scale
        # rehearsals: brute-force pair oracles explode at 10x+; a
        # timed-out oracle is an EXCLUSION to document, not a hang).
        # Unset = no timeout (the driver-identical default).
        timeout = overrides.get(
            name, float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0))
        timer = None
        timed_out = threading.Event()
        if timeout > 0:
            def _interrupt():
                timed_out.set()
                con.interrupt()
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            kind = "ORACLE-TIMEOUT" if timed_out.is_set() else "ORACLE-ERROR"
            results[name] = f"{kind} {e}"
            detail[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(spark_df),
                            "oracle_rows": None,
                            "err": f"{kind}: {str(e)[:300]}"}
            flush_detail()
            continue
        finally:
            if timer is not None:
                timer.cancel()
        a, b = canon(spark_df), canon(duck_df)
        d = {"rows_match": len(a) == len(b),
             "schema_match": list(a.columns) == list(b.columns),
             "hash_match": False, "spark_rows": len(a),
             "oracle_rows": len(b), "err": None}
        if not d["schema_match"]:
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif not d["rows_match"]:
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
        else:
            mism = None
            av, bv = a.values.tolist(), b.values.tolist()
            for i, (ra, rb) in enumerate(zip(av, bv)):
                if ra != rb:
                    mism = f"VALUE-MISMATCH row {i}: spark={ra} duck={rb}"
                    break
            d["hash_match"] = mism is None
            results[name] = mism or f"OK rows={len(a)}"
        detail[name] = d
        flush_detail()

    missing = set(oracle) - set(results)
    if only is not None:
        missing &= only
    for name in sorted(missing):
        results[name] = "MISSING-SPARK-OUTPUT"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "NO-ORACLE")) else "!!"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len([k for k in results if not results[k].startswith('NO-ORACLE')])} oracle-checked queries OK")
    sys.exit(0 if all(v.startswith(("OK", "NO-ORACLE")) for v in results.values()) else 1)


if __name__ == "__main__":
    main()
