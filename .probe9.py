import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Window
from go_htmldate_spark.session import get_spark
from go_htmldate_spark.sources.pages import synth_pages
from go_htmldate_spark.operators.extract import extract_dates
from go_htmldate_spark.options import Options
from go_htmldate_spark.plans.canonical import canonicalize_url, url_hash, url_host
cores = 16
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
pages = synth_pages(spark, 100000, seed=42, partitions=cores*4).cache(); pages.count()
warm = synth_pages(spark, cores*64, seed=7, partitions=cores)
extract_dates(warm, Options()).count()

def step(name, df):
    t0=time.time(); c = df.cache(); n = c.count()
    print(f"T {name:16s} {time.time()-t0:6.2f}s rows={n}", flush=True)
    return c

t_all0=time.time()
frontier = step("canon", pages.select(canonicalize_url(F.col("url")).alias("url")).select(
    "url", url_hash(F.col("url")).alias("url_hash"), url_host(F.col("url")).alias("host")
).withColumn("priority", (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0)))
seen = frontier.filter(F.pmod(F.col("url_hash"), F.lit(10)) < 3).select("url_hash")
cand = step("anti_join", frontier.join(seen, "url_hash", "left_anti"))
w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
sched = step("window", cand.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 1000).drop("r"))
corpus = pages.withColumn("url_canon", canonicalize_url(F.col("url")))
fetch = step("fetch_join", sched.join(corpus.select("url_canon","html"), sched["url"]==F.col("url_canon")).select(sched["url"], "html"))
print("fetch partitions:", fetch.rdd.getNumPartitions(), flush=True)
t0=time.time()
n = extract_dates(fetch, Options()).filter("date != ''").count()
print(f"T extract          {time.time()-t0:6.2f}s rows={n}", flush=True)
print(f"TOTAL {time.time()-t_all0:.2f}s", flush=True)
spark.stop()
