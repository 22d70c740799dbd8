import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    _shingles,
    lsh_candidate_pairs,
    minhash_signature,
)
from peerdb_cdc_psql_clickhouse_spark.session import get_spark

spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print("step", label, round(time.perf_counter() - t0, 2), flush=True)


t("explode_shingles", docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")))
sig = minhash_signature(docs, "doc_id", "text")
t("signature", sig)
t("pairs_from_sig", lsh_candidate_pairs(sig, "doc_id"))
sigc = sig.persist()
sigc.count()
t("pairs_cached_sig", lsh_candidate_pairs(sigc, "doc_id"))
spark.stop()
