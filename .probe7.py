import time, threading, subprocess, sys
sys.path.insert(0, "/root/repo")
import bench_scaling
import pyspark.sql.functions as F
from go_htmldate_spark.session import get_spark
from go_htmldate_spark.sources.pages import synth_pages
from go_htmldate_spark.operators.extract import extract_dates
from go_htmldate_spark.options import Options
spark = get_spark(master="local[32]", shuffle_partitions=32)
pages = synth_pages(spark, 150000, seed=42, partitions=128).cache(); pages.count()
warm = synth_pages(spark, 2048, seed=7, partitions=32)
extract_dates(warm, Options()).count()
done=False
def sample():
    while not done:
        time.sleep(3)
        out = subprocess.run(["ps","ax","-o","%cpu=,comm="],capture_output=True,text=True).stdout
        py = [float(l.split()[0]) for l in out.splitlines() if "python" in l]
        jv = sum(float(l.split()[0]) for l in out.splitlines() if "java" in l)
        print(f"  py_busy={sum(1 for c in py if c>20)} py_cpu={sum(py):.0f}% jvm_cpu={jv:.0f}%", flush=True)
threading.Thread(target=sample, daemon=True).start()
t0=time.time()
n = bench_scaling._pipeline(pages, 32)
done=True
print(f"PIPELINE {time.time()-t0:.2f}s n={n}", flush=True)
spark.stop()
