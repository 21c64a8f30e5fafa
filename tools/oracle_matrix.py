#!/usr/bin/env python3
"""Oracle version-sensitivity matrix (dev tooling, not part of the engine).

Three checks, in order of how they have actually bitten:

1. TYPE PORTABILITY (the real q_vpin r6-r8 red): every column an oracle
   PUBLISHES must be an explicitly-cast portable type (BIGINT / INTEGER
   / DOUBLE / BOOLEAN / VARCHAR / TIMESTAMP / DATE). An uncast
   aggregate output (DuckDB `sum(BIGINT)` → HUGEINT, `sum(DECIMAL)` →
   wider DECIMAL) converts version-dependently in DuckDB's pandas /
   arrow layer (HUGEINT → float64 in some releases, decimal128 /
   object in others), so the driver's hash can drift while every VALUE
   is equal — exactly the failure a value-level diff cannot see. This
   check runs on ONE engine and needs no second build.

2. ROUNDING-POLICY LINT: a `CAST(<2-dp double> AS DECIMAL(18,2))` (or
   any scale-2 decimal cast of a raw double) invokes an engine-owned
   rounding policy — Spark rounds the shortest decimal representation
   half-up, DuckDB rounds the binary value and has changed half-way
   behavior across releases. The engine-proof form is pure-IEEE
   `CAST(floor(x * 100 + 0.5) AS BIGINT)` (graft.functions.Cents) on
   both sides. DECIMAL(25,8) casts of PRODUCTS of 2-dp doubles are
   allowlisted: the exact product has <= 6 decimal places and the
   double error (~1e-10) is far below the 5e-9 rounding boundary, so
   every engine recovers the same rational (tie-immune by
   construction). DECIMAL(38,0) casts of integer-valued expressions are
   likewise exact. Also flags the vpin-shape rehydration: an alias
   defined as a double-finished aggregate that is later re-quantized.

3. CROSS-VERSION EXECUTION: run every oracle under each importable
   DuckDB build and diff canonical result hashes. THIS SANDBOX SHIPS
   EXACTLY ONE BUILD AND HAS NO EGRESS (pip cannot resolve), so the
   cross-version leg reports INSUFFICIENT ENGINES loudly instead of
   green-stamping — a single-engine run proves nothing about version
   drift (r8 lesson: the tool reported "clean" while the driver's
   DuckDB disagreed). Where more builds are importable (vendored
   wheels, a venv matrix on a networked box), list their module names
   in ENGINE_MODULES and the matrix runs for real.

Usage: python3 tools/oracle_matrix.py <sf_dir> <verify_out_dir>
(expects graft.Verify to have populated verify_out_dir, incl.
oracle_sql.json). Exit 1 on any finding; exit 0 with an explicit
single-engine disclaimer when only checks 1+2 could run.
"""
import hashlib
import importlib
import json
import re
import sys

ENGINE_MODULES = ["duckdb"]  # extend with e.g. "duckdb_110" vendored builds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

PORTABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "BOOLEAN", "VARCHAR", "TIMESTAMP", "DATE",
                  "TIMESTAMP WITH TIME ZONE"}

AGG_DOUBLE_ALIAS = re.compile(
    r"CAST\s*\(\s*(?:sum|avg)\s*\(.*?\)\s*AS\s+DOUBLE\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE | re.DOTALL)

# Any scale-2 decimal cast is the engine-owned-rounding class; the
# tie-immune DECIMAL(25,8) / DECIMAL(38,0) families are deliberate.
DEC2_CAST = re.compile(r"AS\s+DECIMAL\s*\(\s*\d+\s*,\s*[12]\s*\)",
                       re.IGNORECASE)


def lint(sql: str):
    hits = []
    if DEC2_CAST.search(sql):
        hits.append("scale<=2 decimal cast (engine-owned rounding; use "
                    "CAST(floor(x*100+0.5) AS BIGINT))")
    for alias in AGG_DOUBLE_ALIAS.findall(sql):
        requant = re.compile(
            r"(round\s*\(\s*{a}\b|CAST\s*\(\s*{a}\s+AS\s+(DECIMAL|BIGINT|INT)"
            r"|CAST\s*\(\s*CAST\s*\(\s*{a}\b)".format(a=re.escape(alias)),
            re.IGNORECASE)
        if requant.search(sql):
            hits.append(f"rehydrated-double re-quantization of '{alias}'")
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

    findings = []

    # --- check 2: lints (no engine needed) -----------------------------
    for name in sorted(oracles):
        for hit in lint(oracles[name]):
            findings.append(f"LINT {name}: {hit}")

    # --- checks 1 + 3: execute under each importable engine ------------
    per_engine = {}
    for mod_name in ENGINE_MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        con = mod.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        hashes = {}
        for name in sorted(oracles):
            try:
                rel = con.sql(oracles[name])
                for c, ty in zip(rel.columns, [str(t) for t in rel.types]):
                    if ty not in PORTABLE_TYPES:
                        findings.append(
                            f"TYPE {name}.{c}: {ty} is not portable — "
                            f"pandas/arrow conversion is version-dependent; "
                            f"add an explicit CAST (the q_vpin r6-r8 red)")
                hashes[name] = canon_hash(con.execute(oracles[name]))
            except Exception as e:
                hashes[name] = f"ERROR: {type(e).__name__}"
                findings.append(f"EXEC {name}: {e}")
        per_engine[f"{mod_name}-{mod.__version__}"] = hashes
        con.close()

    versions = sorted(per_engine)
    if len(versions) >= 2:
        base = per_engine[versions[0]]
        for v in versions[1:]:
            for name, h in per_engine[v].items():
                if base.get(name) != h:
                    findings.append(
                        f"XVER {name}: hash differs {versions[0]} vs {v}")

    print(f"engines executed: {versions}")
    print(f"queries: {len(oracles)}")
    if len(versions) < 2:
        print("WARNING: INSUFFICIENT ENGINES for the cross-version leg — "
              "only type-portability and rounding-policy lints ran. A "
              "clean result here does NOT certify version-independence "
              "by execution; it certifies the oracles avoid every "
              "version-sensitive construct class we know of "
              "(engine-owned decimal rounding, non-portable output "
              "types, rehydrated re-quantization). This sandbox has no "
              "egress; vendor additional duckdb builds to upgrade this "
              "to a real matrix.")
    if findings:
        print(f"{len(findings)} finding(s):")
        for f_ in findings:
            print("  " + f_)
    else:
        print("clean: no findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
