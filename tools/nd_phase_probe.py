"""Phase-timed short slice of the nd2m near-dedup soak (r13 convention:
6 batches x 100k docs), printing the IMCS_ND_TIMING per-phase stderr
marks plus the per-batch walls — the measurement verdict item 3 starts
from. Usage: SPARK_GRAFT_CPUS=32 python tools/nd_phase_probe.py [NB]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("IMCS_ND_TIMING", "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from imcs_spark.session import get_spark  # noqa: E402


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("nd-phase-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from imcs_spark.bench_scale import DOCS_2M, _stage_batches, gen_docs_2m, _ensure
    from imcs_spark.streaming import near_dedup_stream

    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
    )
    path = os.path.join(data_dir, "docs_2m.parquet")
    _ensure(spark, path, gen_docs_2m)
    per_batch = DOCS_2M // 20 + 1  # the soak's batch size (100k docs)
    docs = (
        spark.read.parquet(path)
        .select("doc_id", "text")
        .filter(f"doc_id < {nb * per_batch}")
        .persist()
    )
    print("docs:", docs.count(), flush=True)

    tmp = tempfile.mkdtemp(prefix="imcs_ndprobe_")
    try:
        src = os.path.join(tmp, "incoming")
        target = os.path.join(tmp, "kept")
        chk = os.path.join(tmp, "chk")
        _stage_batches(docs, src, nb, per_batch)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        t0 = time.time()
        q = near_dedup_stream(
            stream, target, num_hashes=16, bands=8,
            sim_threshold=0.5, checkpoint=chk,
        )
        q.awaitTermination(1200)
        print(f"total: {time.time() - t0:.2f}s", flush=True)
        kept = spark.read.parquet(target).count()
        print("kept:", kept, flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
