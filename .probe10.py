import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Window
from go_htmldate_spark.session import get_spark
from go_htmldate_spark.sources.pages import synth_pages
from go_htmldate_spark.operators.extract import extract_dates
from go_htmldate_spark.options import Options
from go_htmldate_spark.plans.canonical import canonicalize_url, url_hash, url_host
cores = int(sys.argv[1])
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
pages = synth_pages(spark, 500000, seed=42, partitions=cores*4).cache(); pages.count()
warm = synth_pages(spark, cores*64, seed=7, partitions=cores)
extract_dates(warm, Options()).count()

def t(name, fn):
    t0=time.time(); fn(); print(f"T {name:20s} {time.time()-t0:6.2f}s", flush=True)

frontier = pages.select(canonicalize_url(F.col("url")).alias("url")).select(
    "url", url_hash(F.col("url")).alias("url_hash"), url_host(F.col("url")).alias("host")
).withColumn("priority", (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0))
seen = frontier.filter(F.pmod(F.col("url_hash"), F.lit(10)) < 3).select("url_hash")
cand_b = frontier.join(seen, "url_hash", "left_anti")
cand_s = frontier.join(seen.hint("shuffle_hash"), "url_hash", "left_anti")
t("frontier_count", lambda: frontier.count())
t("anti_broadcast", lambda: cand_b.count())
t("anti_shufflehash", lambda: cand_s.count())
w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
sched = cand_s.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 1000).drop("r")
t("window", lambda: sched.count())
corpus = pages.withColumn("url_canon", canonicalize_url(F.col("url")))
fetch = sched.join(corpus.select("url_canon","html"), sched["url"]==F.col("url_canon")).select(sched["url"],"html")
t("fetch_join", lambda: fetch.count())
out = extract_dates(fetch.repartition(cores*4), Options())
t("extract", lambda: out.filter("date != ''").count())
t("extract2", lambda: out.filter("date != ''").count())
spark.stop()
