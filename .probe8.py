import time, sys, json
sys.path.insert(0, "/root/repo")
import bench_scaling
import pyspark.sql.functions as F
from pyspark.sql import SparkSession
import os
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.sql.execution.arrow.pyspark.enabled","true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch","2048")
    .config("spark.driver.memory","24g")
    .config("spark.eventLog.enabled","true")
    .config("spark.eventLog.dir","file:///root/repo/.eventlog").config("spark.eventLog.compress","false")
    .config("spark.ui.enabled","false")
    .config("spark.sql.session.timeZone","UTC")
    .getOrCreate())
from go_htmldate_spark.sources.pages import synth_pages
from go_htmldate_spark.operators.extract import extract_dates
from go_htmldate_spark.options import Options
pages = synth_pages(spark, 150000, seed=42, partitions=128).cache(); pages.count()
warm = synth_pages(spark, 2048, seed=7, partitions=32)
extract_dates(warm, Options()).count()
t0=time.time()
n = bench_scaling._pipeline(pages, 32)
print(f"PIPELINE {time.time()-t0:.2f}", flush=True)
spark.stop()
