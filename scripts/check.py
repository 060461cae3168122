#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <outDir> <sfDir>
  <outDir> = Verify output (per-query parquet dirs + oracle_sql.json)
  <sfDir>  = testdata dir whose parquet tables the oracle SQL reads

Compare: column names (sorted), row count, and multiset of rows with
doubles rounded to 9 significant digits before hashing.
"""
import sys, os, json, math
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)

def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    missing = []
    for name, sql in sorted(oracle.items()):
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            missing.append(name)
            continue
        got = con.sql(f"SELECT * FROM '{res_path}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        # symmetric type gate for the ENGINE side: a FLOAT/DECIMAL/etc
        # parquet column would stringify differently across the driver's
        # fetch paths just like an oracle HUGEINT (audited clean at r10;
        # keep it that way structurally)
        # NOTE: FLOAT deliberately absent on BOTH sides — float32
        # materializes as float32 via Arrow but widens to float64 via
        # fetchall, the same fetch-path fragility as HUGEINT
        SAFE_GOT = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
                    "TIMESTAMP WITH TIME ZONE", "BLOB"}
        bad_got = {c: str(t) for c, t in zip(got.columns, got.types)
                   if str(t) not in SAFE_GOT}
        if bad_got:
            print(f"FAIL {name}: engine output carries fetch-path-fragile "
                  f"types {bad_got}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # TYPE GATE: an oracle column outside this allowlist (HUGEINT,
        # UBIGINT, DECIMAL, ...) materializes differently across DuckDB
        # fetch paths/releases — exact int via fetchall here, float64 or
        # object via Arrow/pandas in the driver's comparator. The r7-r9
        # q_embed_gram/q_bpe_merges local-green/driver-red split was
        # exactly an uncast sum(BIGINT) -> HUGEINT. Fail loudly even
        # when the VALUES match locally.
        # FLOAT excluded for the same fetch-path reason as HUGEINT
        # (see SAFE_GOT below)
        SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
                "TIMESTAMP WITH TIME ZONE", "BLOB"}
        bad = {c: str(t) for c, t in zip(exp.columns, exp.types)
               if str(t) not in SAFE}
        if bad:
            print(f"FAIL {name}: oracle emits fetch-path-fragile types {bad} "
                  "— CAST them (see scripts/check.py type gate)")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        g, e = rowset(got_rows, got_cols), rowset(exp_rows, exp_cols)
        if g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {len(missing)} missing: {missing}")
    sys.exit(1 if (n_fail or missing) else 0)

if __name__ == "__main__":
    main()
