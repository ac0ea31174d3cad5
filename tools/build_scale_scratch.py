"""Build an N-times NEAR-DUPLICATE scale scratch from a testdata sf dir
(the corpus behind PLANS.md's 10x / x100 decade audits). Copies get
shifted ids/users/timestamps, perturbed values and embeddings, and a
per-copy token appended to documents — so the dedup family sees ~N^2
more TRUE near-dup pairs while everything else sees N x rows.

Usage:
    python tools/build_scale_scratch.py <out_dir> [N] [sf_dir] [tables]
    # e.g. python tools/build_scale_scratch.py /tmp/sf100x 100 \
    #        /root/testdata/sf0.1 events,documents
"""
import os
import sys

import duckdb


def build(out: str, n: int, sf: str, tables: list[str]) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW copies AS SELECT unnest(generate_series(0, {n - 1})) AS c"
    )
    sql = {
        "documents": """
            SELECT doc_id + c * 10000000 AS doc_id,
                   CASE WHEN c = 0 THEN text ELSE text || ' v' || c END AS text,
                   lang, source, n_chars
            FROM read_parquet('{sf}/documents.parquet'), copies""",
        "events": """
            SELECT event_id + c * 100000000 AS event_id,
                   ts + to_microseconds(c * 37) AS ts,
                   user_id + c * 10000000 AS user_id,
                   event_type,
                   CASE WHEN c = 0 THEN value ELSE value + c * 0.01 END AS value,
                   props
            FROM read_parquet('{sf}/events.parquet'), copies""",
        "embeddings": """
            SELECT vec_id + c * 10000000 AS vec_id,
                   CASE WHEN c = 0 THEN embedding
                        ELSE list_transform(embedding, x -> x + c * 0.0001)
                   END AS embedding,
                   label
            FROM read_parquet('{sf}/embeddings.parquet'), copies""",
        "orders": """
            SELECT o_orderkey + c * 100000000 AS o_orderkey,
                   o_custkey + c * 10000000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{sf}/orders.parquet'), copies""",
        "lineitem": """
            SELECT l_orderkey + c * 100000000 AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{sf}/lineitem.parquet'), copies""",
        "customer": """
            SELECT c_custkey + c * 10000000 AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{sf}/customer.parquet'), copies""",
    }
    for t in tables:
        q = sql.get(t, f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
        q = q.replace("{sf}", sf)
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")
    # passthrough copies for any table a query joins that wasn't scaled
    for t in ["region", "nation", "supplier", "part", "lineitem",
              "orders", "customer", "documents", "events", "embeddings"]:
        if t in tables or os.path.exists(f"{out}/{t}.parquet"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10x"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tables = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else ["documents", "events", "embeddings", "orders", "customer"]
    )
    build(out, n, sf, tables)
