"""Synthesize /tmp/sf1 = sf0.1 replicated 10x with key remapping.
Dims region/nation copied unchanged (semantics preserved); every
other table gets 10 replicas with surrogate keys offset so
referential integrity holds within each replica."""
import duckdb, os, shutil

SRC, DST = "/root/testdata/sf0.1", "/tmp/sf1"
shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)
con = duckdb.connect()
con.execute("SET threads TO 16")

def rep(table, sql):
    q = " UNION ALL ".join(sql.format(r=r) for r in range(10))
    con.execute(
        f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"select count(*) from read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(table, n, flush=True)

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied", flush=True)

rep("customer", f"SELECT c_custkey + {{r}}*100000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM read_parquet('{SRC}/customer.parquet')")
rep("supplier", f"SELECT s_suppkey + {{r}}*10000 AS s_suppkey, s_name, s_nationkey, s_acctbal FROM read_parquet('{SRC}/supplier.parquet')")
rep("part", f"SELECT p_partkey + {{r}}*100000 AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM read_parquet('{SRC}/part.parquet')")
rep("orders", f"SELECT o_orderkey + {{r}}*10000000 AS o_orderkey, o_custkey + {{r}}*100000 AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM read_parquet('{SRC}/orders.parquet')")
rep("lineitem", f"SELECT l_orderkey + {{r}}*10000000 AS l_orderkey, l_partkey + {{r}}*100000 AS l_partkey, l_suppkey + {{r}}*10000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM read_parquet('{SRC}/lineitem.parquet')")
rep("events", f"SELECT event_id + {{r}}*10000000 AS event_id, ts, user_id + {{r}}*100000 AS user_id, event_type, value, props FROM read_parquet('{SRC}/events.parquet')")
rep("documents", f"SELECT CAST(CAST(doc_id AS BIGINT) + {{r}}*1000000 AS VARCHAR) AS doc_id, text, lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')")  # numeric-preserving: tokenize casts doc_id to BIGINT
rep("embeddings", f"SELECT vec_id + {{r}}*1000000 AS vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet')")
