"""One-off A/B: old (8conv/65agg) vs new (3conv/44agg) simhash_bits under
bench's exact protocol (1 untimed warmup + min of 3) in a FRESH session.
Usage: python tools/ab_simhash.py old|new"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.session import get_spark
from fraud_detection_etl_project_spark.operators import dedup as D
from fraud_detection_etl_project_spark.operators.dedup import normalized, spread_for_compute

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def simhash_bits_old(df, text_col="text", id_col="doc_id", bits=128):
    df = spread_for_compute(df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok").cast("binary")))
    lanes = toks.select(
        id_col,
        *[
            F.conv(F.substring("h", 4 * i + 1, 4), 16, 10).cast("long").alias(f"l{i}")
            for i in range((bits + 15) // 16)
        ],
    )

    def _bit(b):
        shift = 4 * (3 - (b // 4) % 4) + b % 4
        return F.shiftright(F.col(f"l{b // 16}"), shift) % 2

    packed = [
        F.sum(_bit(2 * j) * F.lit(2**32) + _bit(2 * j + 1)).alias(f"p{j}")
        for j in range(bits // 2)
    ]
    sums = lanes.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"), *packed)

    def _char(b):
        c = (
            F.shiftright(F.col(f"p{b // 2}"), 32)
            if b % 2 == 0
            else F.col(f"p{b // 2}") % F.lit(2**32)
        )
        return F.when(2 * c > F.col("n"), F.lit("1")).otherwise(F.lit("0"))

    bitstr = F.concat(*[_char(b) for b in range(bits)])
    return sums.select(F.col(id_col), bitstr.alias("simhash"))


def main():
    mode = sys.argv[1]
    spark = get_spark(app_name=f"ab-simhash-{mode}",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    sig = simhash_bits_old(docs) if mode == "old" else D.simhash_bits(docs, bits=128)
    q = D.simhash_band_pairs(sig, sig_bits=128, n_bands=4, max_d=3,
                             bucket_cap=64, salt_groups=8)

    def run():
        q.write.format("noop").mode("overwrite").save()

    run()  # untimed warmup
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"AB {mode}: min={min(samples)} samples={samples}")


if __name__ == "__main__":
    main()
