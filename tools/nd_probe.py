"""Standalone instrumented near-dedup soak probe (round 12): replays a
parameterized slice of the 2M-doc corpus through near_dedup_stream with
IMCS_ND_TIMING=1 and prints the per-phase medians — the decomposition
the VERDICT asked for before cutting the per-batch fixed cost.

Usage: python tools/nd_probe.py [n_docs] [n_batches]
"""
import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["IMCS_ND_TIMING"] = "1"

from imcs_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 20

spark = get_spark("nd-probe", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")

from imcs_spark.bench_scale import gen_docs_2m, _ensure, _stage_batches  # noqa: E402
from imcs_spark.streaming import near_dedup_stream  # noqa: E402

data_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata")
path = os.path.join(data_dir, "docs_2m.parquet")
_ensure(spark, path, gen_docs_2m)
docs = spark.read.parquet(path).filter(f"doc_id < {N}").select("doc_id", "text").persist()
print("docs:", docs.count(), flush=True)

tmp = tempfile.mkdtemp(prefix="imcs_ndprobe_")
src = os.path.join(tmp, "incoming")
target = os.path.join(tmp, "kept")
chk = os.path.join(tmp, "chk")
try:
    _stage_batches(docs, src, NB, N // NB + 1)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    t0 = time.time()
    q = near_dedup_stream(
        stream, target, num_hashes=16, bands=8, sim_threshold=0.5,
        checkpoint=chk,
    )
    finished = q.awaitTermination(1800)
    total = time.time() - t0
    if not finished:
        # stop the live query BEFORE the finally-block rmtree pulls its
        # source/target/checkpoint away (same discipline as the soak)
        q.stop()
        print(f"TIMEOUT after {total:.1f}s", flush=True)
        sys.exit(1)
    batch_secs = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in (q.recentProgress or [])
        if p.get("durationMs", {}).get("triggerExecution") is not None
        and p.get("numInputRows", 0) > 0
    )
    print(f"TOTAL {total:.1f}s batches={len(batch_secs)} "
          f"min={batch_secs[0]:.2f} med={batch_secs[len(batch_secs)//2]:.2f} "
          f"max={batch_secs[-1]:.2f}", flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
