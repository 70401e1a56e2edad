#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
sf tables registered as views, sort columns by name and rows by value,
and compare cell-by-cell. Queries without an oracle get a rows-only
check (>0 rows).

REPLICA-PARITY NOTE (r11 lesson): this gate is a replica of the
driver's typed-hash gate, not the gate itself. The driver runs its own
DuckDB build; an oracle whose plan contains a version-sensitive
intermediate (HUGEINT from sum(INTEGER), implicit list-type
unification, ...) can PASS here and FAIL there. Keep oracle SQL free
of HUGEINT (CAST every integer sum to BIGINT, widen products through
DECIMAL(19,0)) and check the printed duckdb version when triaging a
driver-only failure. On any cell mismatch the JSON record carries the
first differing cells from BOTH sides ("first_diffs") so a replica gap
costs a look, not a round.
"""
import json
import math
import struct
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    # Typed compare: ints stay ints, floats stay floats, so type-level
    # mismatches (e.g. DuckDB HUGEINT sum vs Spark BIGINT) FAIL here the
    # same way they fail the driver's typed hash gate (ADVICE r1).
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # Bitwise, not value compare: the driver's typed hash hashes the
        # raw float bytes, so -0.0 != +0.0 there (q_graph_modularity,
        # r8). Python == treats them equal, which let a real driver
        # failure pass locally; struct.pack makes the replica agree.
        return ("float", struct.pack(">d", v))
    if isinstance(v, int):
        return ("int", v)
    try:  # Decimal: distinct from float, REPRESENTATION-level compare
        # (sign, digits, exponent) — NOT normalize(): the driver's
        # typed hash sees a scale difference between a Spark-parquet
        # decimal and a DuckDB decimal even when the values are equal
        # (VERDICT r12 item 1: the whole r12 red set), and normalize()
        # was hiding exactly that class of gap from this replica.
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("decimal", str(v.as_tuple()))
    except Exception:
        pass
    return ("other", str(v))


def canon_type(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t  # HUGEINT, DECIMAL(p,s), VARCHAR, BOOLEAN, TIMESTAMP, ...


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: str(t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    records = {}
    print(f"duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    qdirs = sorted(
        d.split("/")[-1] for d in glob.glob(f"{out_dir}/q_*") )
    # Enumerate from the catalog manifest too: a query that errored
    # before writing output must be a FAIL, not a silent omission.
    # A MISSING manifest is itself a failure (a stale out_dir or a
    # Verify crash before the manifest write would otherwise shrink
    # the gate silently).
    if not os.path.exists(f"{out_dir}/catalog.json"):
        print(f"FAIL catalog.json missing from {out_dir} — "
              "incomplete Verify run, nothing can be trusted")
        sys.exit(1)
    catalog = json.load(open(f"{out_dir}/catalog.json"))
    n_pass = n_fail = 0
    # An oracle keyed to no catalog entry is a dead gate: it compares
    # nothing, so a typo'd registration would pass forever.
    for orphan in sorted(set(oracles) - set(catalog)):
        print(f"FAIL {orphan} (oracle has no matching catalog query)")
        records[orphan] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": None,
                           "oracle_rows": None, "err": "orphan oracle"}
        n_fail += 1
    for q in sorted(set(qdirs) | set(catalog)):
        if q not in qdirs:
            print(f"FAIL {q} (no output written: query failed in Verify)")
            records[q] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "spark_rows": 0,
                          "oracle_rows": None, "err": "no output"}
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if q not in oracles:
            ok = len(grows) > 0
            print(f"{'PASS' if ok else 'FAIL'} {q} (rows-only: {len(grows)})")
            records[q] = {"rows_match": None, "schema_match": None,
                          "hash_match": None, "spark_rows": len(grows),
                          "oracle_rows": None, "err": "no_oracle"}
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            exp = con.execute(oracles[q])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
            # Type-level compare: the duckdb client returns HUGEINT as a
            # plain int, hiding exactly the type mismatch that fails the
            # driver's typed hash (q_cast_coercion, r1). Canonicalize
            # both sides' column types via DESCRIBE and require equality.
            etypes = dict(
                (r[0], canon_type(r[1])) for r in
                con.execute(f"DESCRIBE {oracles[q]}").fetchall())
            gtypes = dict(
                (r[0], canon_type(r[1])) for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{out_dir}/{q}/*.parquet'"
                ).fetchall())
            # Emit-convention ban (VERDICT r12): a DECIMAL (or HUGEINT)
            # column at the output boundary of EITHER side is a driver
            # hash mismatch even when every value is bit-identical —
            # the r12 red set was exactly the catalog's decimal-output
            # queries, and this replica passed them all. Fail here so
            # the gap costs a local run, not a round.
            banned = {c: (gtypes.get(c), etypes.get(c))
                      for c in set(etypes) | set(gtypes)
                      if any(t and (t.startswith("DECIMAL")
                                    or t == "HUGEINT")
                             for t in (gtypes.get(c), etypes.get(c)))}
            if banned:
                print(f"FAIL {q} decimal/hugeint at the emit boundary "
                      f"(driver-red by convention): {banned}")
                records[q] = {"rows_match": len(grows) == len(erows),
                              "schema_match": False, "hash_match": False,
                              "spark_rows": len(grows),
                              "oracle_rows": len(erows),
                              "err": "decimal emit"}
                n_fail += 1
                continue
            tdiff = {c: (gtypes.get(c), etypes.get(c))
                     for c in set(etypes) | set(gtypes)
                     if gtypes.get(c) != etypes.get(c)}
            if tdiff:
                print(f"FAIL {q} column types differ (spark, oracle): {tdiff}")
                records[q] = {"rows_match": len(grows) == len(erows),
                              "schema_match": False, "hash_match": False,
                              "spark_rows": len(grows),
                              "oracle_rows": len(erows), "err": None}
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {q} oracle error: {e}")
            records[q] = {"rows_match": None, "schema_match": None,
                          "hash_match": None, "spark_rows": len(grows),
                          "oracle_rows": None, "err": str(e)[:200]}
            n_fail += 1
            continue
        gc, gr = norm_rows(gcols, grows)
        ec, er = norm_rows(ecols, erows)
        records[q] = {"rows_match": len(gr) == len(er),
                      "schema_match": gc == ec,
                      "hash_match": gc == ec and gr == er,
                      "spark_rows": len(gr), "oracle_rows": len(er),
                      "err": None}
        if gc != ec:
            print(f"FAIL {q} columns: spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {q} rowcount: spark={len(gr)} oracle={len(er)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {q} {len(bad)}/{len(gr)} rows differ; first:")
            print(f"  spark : {bad[0][0]}")
            print(f"  oracle: {bad[0][1]}")
            # Artifact the first differing cells (both sides, typed)
            # so a local-vs-driver hash gap is diagnosable from the
            # JSON alone (VERDICT r11 item 1c).
            records[q]["first_diffs"] = [
                {"spark": repr(a), "oracle": repr(b)}
                for a, b in bad[:3]]
            n_fail += 1
        else:
            print(f"PASS {q} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        # driver-format per-query record, for artifact refreshes
        json.dump(records, open(json_out, "w"), indent=2)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
