"""Generate a local sf1 dataset (~10x sf0.1) for scaling measurements.

The driver ships sf0.001/0.01/0.1 only; SCALE.md's data-term scaling
claims need at least one decade more data to be measured rather than
extrapolated. This synthesizes sf1 from sf0.1 by key-offset sharding:
10 shards, every key column offset by shard*10^7, so all join
relationships (orders↔lineitem↔part/supplier/customer) hold and
per-key selectivities match the source distribution.

Two families need per-shard decorrelation or the scaled corpus would
be 10 exact clones and distort exactly the operators we want to
measure:

- documents: shard k>0 interleaves a shard token every 3rd token.
  Within-shard near-dup structure is preserved (both members of a
  planted pair get the same transform, trigram Jaccard ~unchanged);
  across shards every trigram contains a shard token -> zero shingle
  overlap -> no cross-shard candidate explosion in MinHash/SimHash.
- embeddings: shard k>0 adds a deterministic per-(vec,dim,shard)
  jitter of up to ±2% of the value range, so ANN/k-means see 20k
  distinct points instead of 10 copies of 2k.

Events shift user_id/event_id only (timestamps unchanged): sessionize
and windows are per-user, so 10x users = 10x data at the same
temporal profile. region/nation are dimensions and stay as-is.

Output: /tmp/testdata_sf1/*.parquet (DuckDB COPY, default row groups,
so big tables get tens of row groups — unlike the single-row-group
driver files, scans actually parallelize, which is the point of the
measurement). Usage:

    python tools/gen_sf1.py [out_dir]
    SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHARDS = 10
OFF = 10_000_000


def main(out_dir: str = "/tmp/testdata_sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    con.execute(f"CREATE VIEW shards AS SELECT unnest(range({SHARDS})) AS k")

    copies = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + k*{OFF} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer, shards""",
        "supplier": f"""
            SELECT s_suppkey + k*{OFF} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, shards""",
        "part": f"""
            SELECT p_partkey + k*{OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part, shards""",
        "orders": f"""
            SELECT o_orderkey + k*{OFF} AS o_orderkey,
                   o_custkey + k*{OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, shards""",
        "lineitem": f"""
            SELECT l_orderkey + k*{OFF} AS l_orderkey,
                   l_partkey + k*{OFF} AS l_partkey,
                   l_suppkey + k*{OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, shards""",
        "events": f"""
            SELECT event_id + k*{OFF} AS event_id, ts,
                   user_id + k*{OFF} AS user_id, event_type, value, props
            FROM events, shards""",
        # shard token every 3rd token: in-shard pair structure intact,
        # zero cross-shard trigram overlap
        "documents": f"""
            WITH tok AS (
              SELECT doc_id, k, lang, source,
                     string_split(text, ' ') AS toks
              FROM documents, shards
            ), rebuilt AS (
              SELECT doc_id + k*{OFF} AS doc_id,
                     CASE WHEN k = 0 THEN array_to_string(toks, ' ')
                          ELSE array_to_string(
                            flatten(list_transform(
                              generate_series(1, len(toks)),
                              i -> CASE WHEN i % 3 = 1
                                   THEN ['s' || CAST(k AS VARCHAR), toks[i]]
                                   ELSE [toks[i]] END)), ' ')
                     END AS text,
                     lang, source
              FROM tok
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM rebuilt""",
        # ±2% deterministic jitter per (vec, dim, shard)
        "embeddings": f"""
            SELECT vec_id + k*{OFF} AS vec_id,
                   CASE WHEN k = 0 THEN embedding
                        ELSE CAST(list_transform(
                          generate_series(1, len(embedding)),
                          d -> embedding[d] + 0.02 * (
                            CAST(hash(vec_id * 1315423911 + d * 2654435761 + k)
                                 % 1000 AS DOUBLE) / 1000.0 - 0.5))
                          AS FLOAT[]) END AS embedding,
                   label
            FROM embeddings, shards""",
    }
    for t, q in copies.items():
        dest = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {dest}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
