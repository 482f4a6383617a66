"""Decompose dedup_minhash_lsh and A/B the signing kernel:
JVM higher-order-lambda fold (current) vs an Arrow mapInPandas stage
(hashlib md5 + numpy tempering) that must be bit-identical.

r12 verdict (5-rep interleaved medians at sf0.1, noop sink): full
query 1.40 s / shingling 0.51 s / shingling+JVM signing 0.65 s /
shingling+Arrow signing 0.90 s — the Arrow boundary (~0.39 s of
string-array transfer) costs more than the whole JVM tempering fold
it replaces (0.14 s). REJECTED; kept as the measured prototype and
as a template for re-measuring if K ever grows large enough to flip
the trade (boundary cost is K-independent, fold cost is O(K)).

Stages timed through the noop sink, interleaved, release_blocks
between reps.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datanika_core_spark.blocks import release_blocks
from datanika_core_spark.session import build_spark
from datanika_core_spark.operators.minhash import MH_K, MH_P, add_signature
from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.text_dedup import (
    _SHINGLES_EXPR,
    _corpus_neardup,
    _with_toks,
)


def shingled(spark, sf_dir) -> DataFrame:
    corpus = _with_toks(_corpus_neardup(spark, sf_dir))
    return corpus.filter(F.size("toks") >= 3).withColumn(
        "shingles", F.expr(_SHINGLES_EXPR)
    ).select("doc_id", "shingles")


def sign_jvm(sh: DataFrame) -> DataFrame:
    return add_signature(sh).select("doc_id", "sig")


def sign_arrow(sh: DataFrame) -> DataFrame:
    k, p = MH_K, MH_P

    def batches(it):
        import hashlib

        odd = np.arange(k, dtype=np.uint64) * 2 + 1     # 2s+1
        add = np.arange(k, dtype=np.uint64)             # s
        for pdf in it:
            sigs = []
            for shl in pdf["shingles"]:
                if len(shl) == 0:
                    sigs.append([])
                    continue
                h = np.fromiter(
                    (
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
                        % p
                        for s in shl
                    ),
                    dtype=np.uint64,
                    count=len(shl),
                )
                # ((h % p) * (2s+1) + s) % p  — exact in uint64:
                # h%p < 2^30, (2s+1) <= 31 -> product < 2^35
                m = (np.outer(h, odd) + add) % p
                sigs.append(m.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return sh.mapInPandas(batches, "doc_id bigint, sig array<bigint>")


def main() -> None:
    import os
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell"
    )
    spark = build_spark(app_name="mh_ab")
    full_fn = load_all()["dedup_minhash_lsh"].fn

    # bit-identical check at sf0.01
    sf = "/root/testdata/sf0.01"
    a = {r["doc_id"]: list(r["sig"]) for r in sign_jvm(shingled(spark, sf)).collect()}
    b = {r["doc_id"]: list(r["sig"]) for r in sign_arrow(shingled(spark, sf)).collect()}
    assert a == b, "signature mismatch"
    print(f"signatures bit-identical at {sf}: {len(a)} docs")
    release_blocks(spark)

    sf = "/root/testdata/sf0.1"
    warm = full_fn(spark, sf)
    warm.write.format("noop").mode("overwrite").save()
    release_blocks(spark)
    cases = {
        "full_query": lambda: full_fn(spark, sf),
        "shingle_only": lambda: shingled(spark, sf),
        "sign_jvm": lambda: sign_jvm(shingled(spark, sf)),
        "sign_arrow": lambda: sign_arrow(shingled(spark, sf)),
    }
    samples = {n: [] for n in cases}
    for rep in range(5):
        for name, fn in cases.items():
            spark.sparkContext.setJobDescription(f"mh:{name}:{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            release_blocks(spark)
    for name, s in samples.items():
        med = sorted(s)[len(s) // 2]
        print(f"TIME {name}: median={med:.3f}s all={[round(x, 3) for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
