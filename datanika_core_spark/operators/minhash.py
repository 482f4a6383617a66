"""Persisted-signature MinHash dedup — the 100 TB operating mode.

The workload twin (``workloads/text_dedup.py::dedup_minhash_lsh``)
computes signatures in-flight and caches them for one run. At corpus
scale you don't recompute 100 TB of signatures per dedup pass: the
signature table IS the index, persisted in the warehouse and updated
incrementally — a new batch of documents gets signed, appended, and
banded against the EXISTING signatures; unchanged documents are never
re-read.

Scale properties:
- ``update()`` signs only docs absent from the store (left-anti on
  doc_id — one shuffle against the store's doc_id set, or shuffle-free
  if both sides are bucketed by doc_id).
- ``pairs()`` reads signatures from the store (no text re-hash), bands
  them per-row (no shuffle), and only the band-bucket equi-join + the
  candidate verification shuffle.
- Verification re-reads shingles ONLY for candidate docs (semi-join
  pushdown into the corpus scan), so exact-Jaccard cost is
  proportional to candidate count, not corpus size.

Hash design matches the workload (md5-hash-once + arithmetic
tempering, K permutations via higher-order lambdas) so store-backed
results are bit-identical to the in-flight pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# -- shared expression fragments (imported by workloads/text_dedup.py) ----

TOKS_PATTERN = r"\s+"

#: distinct word-3-gram shingles from a `toks` array column
SHINGLES_EXPR = (
    "CASE WHEN size(toks) >= 3 THEN array_distinct(transform("
    "sequence(1, size(toks)-2),"
    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))"
    " ELSE array() END"
)

MH_K = 16   # signature length
MH_B = 4    # bands
MH_R = 4    # rows per band; candidate threshold ~ (1/B)^(1/R) ≈ 0.71
# 30-bit prime keeps the tempering products < 2^35 — exact in BIGINT
# under ANSI mode on both Spark and DuckDB.
MH_P = 1_000_000_007


def spark_hash_expr(x: str) -> str:
    """60-bit md5-derived hash, DuckDB-reproducible."""
    return f"cast(conv(substring(md5({x}),1,15),16,10) as bigint)"


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc rows → + ``shingles`` (distinct word-3-grams of the
    normalized text). Rows with <3 tokens get an empty array."""
    return (
        df.withColumn("toks", F.split(F.lower(F.trim(F.col(text_col))), TOKS_PATTERN))
        .withColumn("shingles", F.expr(SHINGLES_EXPR))
        .drop("toks")
    )


def add_signature(df: DataFrame, k: int = MH_K, p: int = MH_P) -> DataFrame:
    """+ ``sig`` (array<bigint> length ``k``) from a ``shingles``
    column. Per-row lambdas only — no shuffle, linear in corpus size;
    one md5 per shingle, the k permutations are arithmetic tempering.

    The md5 hash array is LET-BOUND (``transform(array(hashes),
    hs -> ...)[0]``): as a projected column it would collapse-inline
    into the permutation lambda and re-evaluate once per permutation
    — k× the hashing work (measured 16.2 s → 9.2 s for the sf0.1
    signing pass; same trap as operators/winnow.with_fingerprints).
    """
    hashes = f"transform(shingles, sh -> {spark_hash_expr('sh')})"
    let_sig = (
        f"transform(array({hashes}), hs -> "
        f"transform(sequence(0, {k - 1}), s -> "
        f"array_min(transform(hs, h -> "
        f"((h % {p}) * (2*s + 1) + s) % {p}))))[0]"
    )
    return df.withColumn("sig", F.expr(let_sig))


def band_signatures(sigs: DataFrame, b: int = MH_B, r: int = MH_R) -> DataFrame:
    """signatures → (doc_id, band index ``b``, band hash ``bh``); the
    LSH bucketing key. Explodes b rows per doc — map-side only."""
    return sigs.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(0, {b - 1}), b -> struct(b AS b, "
            f"md5(concat_ws(',', transform(slice(sig, {r}*b + 1, {r}),"
            f" x -> cast(x as string)))) AS bh))"
        )).alias("band"),
    ).select("doc_id", "band.b", "band.bh")


@dataclass
class MinHashSignatureStore:
    """Warehouse-persisted MinHash signature index.

    ``table`` holds (doc_id bigint, sig array<bigint>). Append-only:
    ``update`` signs and appends only unseen doc_ids, so successive
    dedup runs over a growing corpus pay signature cost proportional
    to the NEW data, not the whole corpus.
    """

    spark: SparkSession
    table: str
    k: int = MH_K
    b: int = MH_B
    r: int = MH_R

    def update(self, corpus: DataFrame, text_col: str = "text") -> int:
        """Sign docs not yet in the store; append. Returns the number
        of newly signed docs (observed during the append write — no
        extra scan)."""
        from datanika_core_spark.operators.writers import TableWriter

        new_docs = corpus.select("doc_id", text_col)
        if self.spark.catalog.tableExists(self.table):
            existing = self.spark.table(self.table).select("doc_id")
            new_docs = new_docs.join(existing, "doc_id", "left_anti")
        sigs = (
            add_signature(
                with_shingles(new_docs, text_col).filter(F.size("shingles") > 0),
                self.k,
            )
            .select("doc_id", "sig")
        )
        sigs, obs = TableWriter._observed(sigs)
        mode = "append" if self.spark.catalog.tableExists(self.table) else "overwrite"
        sigs.write.format("parquet").mode(mode).saveAsTable(self.table)
        return obs.get["rows"]

    def candidate_pairs(self) -> DataFrame:
        """LSH banding over the STORED signatures → distinct
        (doc_a < doc_b) candidate pairs."""
        bands = band_signatures(self.spark.table(self.table), self.b, self.r)
        a, c = bands.alias("a"), bands.alias("c")
        return (
            a.join(c, (F.col("a.b") == F.col("c.b"))
                   & (F.col("a.bh") == F.col("c.bh"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"))
            .distinct()
        )

    def pairs(
        self, corpus: DataFrame, threshold: float = 0.7,
        text_col: str = "text",
    ) -> DataFrame:
        """Near-dup pairs ≥ ``threshold`` exact Jaccard. Signatures
        come from the store; shingles are recomputed ONLY for
        candidate docs (the joins semi-prune the corpus scan)."""
        cand = self.candidate_pairs()
        sh = with_shingles(corpus.select("doc_id", text_col), text_col)
        x = sh.select(F.col("doc_id").alias("doc_a"),
                      F.col("shingles").alias("sh_a"))
        y = sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("shingles").alias("sh_b"))
        verified = cand.join(x, "doc_a").join(y, "doc_b").select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size("sh_a").alias("la"), F.size("sh_b").alias("lb"),
        )
        jac = (F.col("inter") * 1.0
               / (F.col("la") + F.col("lb") - F.col("inter")))
        return (
            verified.filter(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .orderBy("doc_a", "doc_b")
        )
