#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name on both sides, and compares row-by-row. This mimics the
driver's hash compare so mismatches are caught before the round gate runs.
Tooling only — the shipped Scala library does not depend on this.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    # timestamps/dates -> ISO string
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def tclass(t):
    """Type equivalence class for the hash-compat check. Int widths up to
    64 bits (signed or unsigned — equal values surface as equal Python
    ints) hash identically in the driver; HUGEINT (int128) does NOT —
    it surfaces as decimal/float and tags the hash differently. DECIMAL
    precision is erased (equal Decimals hash identically at any p) but
    scale is kept: it changes the quantum and thus the value repr."""
    u = str(t).upper()
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT64"
    if u in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    if u.startswith("DECIMAL(") and "," in u:
        return "DECIMAL_s" + u.split(",")[1].strip(") ")
    return u

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = spark_rel.columns
            stypes = [str(t) for t in spark_rel.types]
            sdf = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            dcols = duck_rel.columns
            dtypes = [str(t) for t in duck_rel.types]
            ddf = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-TAGGED at the Python-object level: int
        # widths <=64 bit all surface as equal Python ints (the 16 historic
        # INTEGER-vs-BIGINT queries are hash-green), but DuckDB's bare sum()
        # is HUGEINT -> arrow decimal128 -> hash-red despite equal values
        # (the r4 lesson: agg_cube et al). Compare type EQUIVALENCE CLASSES.
        smap = dict(zip(scols, [tclass(t) for t in stypes]))
        dmap = dict(zip(dcols, [tclass(t) for t in dtypes]))
        tbad = [(c, smap[c], dmap[c]) for c in sorted(scols) if smap[c] != dmap[c]]
        if tbad:
            print(f"FAIL {name}: column TYPES differ (cast the oracle): " +
                  ", ".join(f"{c} spark={a} duck={b}" for c, a, b in tbad))
            n_fail += 1
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        srows = [tuple(norm(r[i]) for i in sidx) for r in sdf]
        drows = [tuple(norm(r[i]) for i in didx) for r in ddf]
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]} (cols {sorted(scols)})\n"
                  f"  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
