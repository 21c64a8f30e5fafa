#!/usr/bin/env python3
"""Oracle version-sensitivity matrix (dev tooling, not part of the engine).

The q_vpin saga: a `CAST(<rehydrated double> AS DECIMAL)` at a half-cent
boundary rounds differently across DuckDB releases (shortest-decimal vs
binary-value rounding), so a query can hash-green on the local DuckDB
and stay red under the driver's. This tool makes that class of drift
visible BEFORE the driver does, two ways:

1. EXECUTE each `SparkEntry.oracleSql` under every importable DuckDB
   build (module names in ENGINE_MODULES; the sandbox ships one, the
   loop handles more when present) and diff canonical result hashes
   across versions. Any cross-version mismatch = version-sensitive.

2. LINT each oracle for the drift-prone dataflow itself, which needs no
   second engine: an alias defined as a double-finished aggregate
   (`CAST(sum|avg(...) AS DOUBLE) AS x`) that is later re-quantized
   (`round(x...)` or `CAST(x AS DECIMAL/BIGINT)` or `x * 100 ... CAST`)
   — the exact vpin shape. Per-row quantization of source columns is
   fine (2-decimal doubles are exact); REHYDRATED doubles are not.

Usage: python3 tools/oracle_matrix.py <sf_dir> <verify_out_dir>
(expects graft.Verify to have populated verify_out_dir, incl.
oracle_sql.json). Exit 1 on any cross-version mismatch or lint hit.
"""
import hashlib
import importlib
import json
import re
import sys

ENGINE_MODULES = ["duckdb"]  # extend with e.g. "duckdb_110" vendored builds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

AGG_DOUBLE_ALIAS = re.compile(
    r"CAST\s*\(\s*(?:sum|avg)\s*\(.*?\)\s*AS\s+DOUBLE\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE | re.DOTALL)


def lint(sql: str):
    """Aliases of double-finished aggregates that are later re-quantized."""
    hits = []
    for alias in AGG_DOUBLE_ALIAS.findall(sql):
        requant = re.compile(
            r"(round\s*\(\s*{a}\b|CAST\s*\(\s*{a}\s+AS\s+(DECIMAL|BIGINT|INT)"
            r"|CAST\s*\(\s*CAST\s*\(\s*{a}\b)".format(a=re.escape(alias)),
            re.IGNORECASE)
        if requant.search(sql):
            hits.append(alias)
    return hits


def canon_hash(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple("\x00" if r[i] is None else repr(r[i]) for i in order)
         for r in cur.fetchall()))
    h = hashlib.sha256()
    h.update("|".join(cols[i] for i in order).encode())
    for r in rows:
        h.update("\x01".join(r).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    lint_hits = {}
    for name in sorted(oracles):
        hits = lint(oracles[name])
        if hits:
            lint_hits[name] = hits

    per_engine = {}
    for mod_name in ENGINE_MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        con = mod.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        hashes = {}
        for name in sorted(oracles):
            try:
                hashes[name] = canon_hash(con.execute(oracles[name]))
            except Exception as e:
                hashes[name] = f"ERROR: {e}"
        per_engine[f"{mod_name}-{mod.__version__}"] = hashes
        con.close()

    versions = sorted(per_engine)
    mismatches = []
    if len(versions) >= 2:
        base = per_engine[versions[0]]
        for v in versions[1:]:
            for name, h in per_engine[v].items():
                if base.get(name) != h:
                    mismatches.append((name, versions[0], v))

    print(f"engines executed: {versions}")
    print(f"queries: {len(oracles)}")
    print(f"cross-version mismatches: {mismatches or 'none (single engine: n/a)' if len(versions) < 2 else mismatches}")
    if lint_hits:
        print("LINT: rehydrated-double re-quantization (version-sensitive):")
        for name, aliases in sorted(lint_hits.items()):
            print(f"  {name}: {aliases}")
    else:
        print("LINT: no rehydrated-double re-quantization found")
    return 1 if (mismatches or lint_hits) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
