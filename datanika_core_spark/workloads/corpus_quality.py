"""Corpus-quality operators for training-data curation: Gopher-style
repetition filters, a staged filter funnel, temperature-scaled source
mixture weights, and deterministic PII redaction (beyond-reference,
SURVEY.md §7 Phase 4 — modeled on the published Gopher/C4 curation
rules: Rae et al. 2021 §A1.1, Raffel et al. 2020 §2.2).

Scale design:
- Repetition metrics: the only shuffle is the per-(doc, token)
  count for the top-token fraction — two keyed aggregations on
  doc_id, both map-side-combinable; bigram dedup ratios are pure
  higher-order array expressions (no shuffle, no UDF).
- The filter funnel is ONE pass over the corpus: every stage is a
  conditional aggregate on the same scan, so adding stages costs
  zero extra I/O (vs. the naive one-count-per-stage loop that
  re-reads 100 TB per stage).
- Mixture weights aggregate to |sources|×|langs| rows — the global
  normalization window runs on that tiny aggregate, not the corpus.
- PII redaction is regexp_replace/regexp_count only — stays in
  whole-stage codegen. The corpus has no real PII, so deterministic
  fake emails/phones are injected (doc_id-derived, identically on
  the oracle side) to prove the redaction actually fires; the
  `residual_*` columns assert the redacted text has zero matches
  left, and a bit_xor fingerprint of the redacted text proves both
  engines produced byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datanika_core_spark.workloads import t, workload
from datanika_core_spark.workloads.text_dedup import (
    _O_HASH,
    _O_TOKS,
    _norm_docs,
    _spark_hash,
    _with_toks,
)

# --------------------------------------------------------------------------
# Shared fragments.
# --------------------------------------------------------------------------

# Bigram arrays (1-based element_at on both engines).
_BIGRAMS_SPARK = (
    "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks)-1),"
    " i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"
    " ELSE array() END"
)
_BIGRAMS_DUCK = (
    "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),"
    " i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
)

# dup-bigram fraction: 1 - distinct/total (0 for degenerate docs).
# NB: SQL-literal 1.0 is DECIMAL in Spark — decimal division rounds
# differently from DuckDB's double at threshold boundaries, so force
# double arithmetic explicitly.
_DBF_SPARK = (
    "CASE WHEN size(bigrams) = 0 THEN CAST(0.0 AS DOUBLE) ELSE"
    " CAST(1.0 AS DOUBLE)"
    " - CAST(size(array_distinct(bigrams)) AS DOUBLE) / size(bigrams) END"
)
_DBF_DUCK = (
    "CASE WHEN len(bigrams) = 0 THEN 0.0 ELSE"
    " 1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams) END"
)

# Count of the single most frequent token, computed per-row with NO
# shuffle: sort the token array, then the longest run of equal
# adjacent elements IS the max token count. O(n log n) per document
# inside whole-stage codegen — replaces explode + two keyed
# aggregations (two shuffles of every token in the corpus) + a join
# back; at 100 TB the explode shape shuffles ~the corpus itself.
_TOP_CNT_SPARK = """aggregate(
  array_sort(toks),
  named_struct('run', 0, 'best', 0, 'prev', CAST(NULL AS STRING)),
  (acc, x) -> named_struct(
     'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),
     'best', greatest(acc.best,
                      IF(acc.prev IS NOT NULL AND x = acc.prev,
                         acc.run + 1, 1)),
     'prev', x),
  acc -> acc.best)"""

_STOPWORDS_IN = "'the', 'a', 'and', 'of', 'to', 'is'"

# Gopher-ish thresholds, calibrated so the synthetic corpus splits
# non-trivially (top-token frac spans 0.05-0.30, dup-bigram 0-0.13).
_TTF_MAX = 0.12
_DBF_MAX = 0.05
_STOP_MIN = 0.02
_MIN_TOKENS = 30


# --------------------------------------------------------------------------
# Gopher repetition filter: top-token fraction + duplicate-bigram
# fraction per document.
# --------------------------------------------------------------------------


@workload(
    "corpus_gopher_repetition",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {_O_TOKS} AS toks FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
topc AS (
  SELECT doc_id, max(c) AS top_cnt
  FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
  GROUP BY 1
),
bg AS (SELECT doc_id, {_BIGRAMS_DUCK} AS bigrams FROM d)
SELECT d.doc_id,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       round(top_cnt * 1.0 / len(d.toks), 6) AS top_tok_frac,
       round({_DBF_DUCK}, 6) AS dup_bigram_frac,
       (top_cnt * 1.0 / len(d.toks) <= {_TTF_MAX}
        AND {_DBF_DUCK} <= {_DBF_MAX}) AS keep
FROM d JOIN topc USING (doc_id) JOIN bg USING (doc_id)
ORDER BY doc_id
""",
)
def corpus_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile (Gopher A1.1-style): fraction
    of tokens taken by the single most frequent token, and fraction
    of duplicated bigrams; `keep` applies both thresholds.

    The whole profile is ONE map-only pass: the top-token count is
    the longest equal-run of the sorted token array (_TOP_CNT_SPARK)
    and bigram stats are array expressions — no shuffle, no join,
    no UDF."""
    d = _with_toks(_norm_docs(spark, sf_dir)).select("doc_id", "toks")
    bg = d.withColumn("bigrams", F.expr(_BIGRAMS_SPARK)) \
          .withColumn("top_cnt", F.expr(_TOP_CNT_SPARK))
    dbf = F.expr(_DBF_SPARK)
    ttf = F.col("top_cnt") * F.lit(1.0) / F.size("toks")
    return (
        bg
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.round(ttf, 6).alias("top_tok_frac"),
            F.round(dbf, 6).alias("dup_bigram_frac"),
            ((ttf <= _TTF_MAX) & (dbf <= _DBF_MAX)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Filter funnel: staged survivor counts in ONE corpus pass.
# --------------------------------------------------------------------------

_FUNNEL_STAGES = [
    ("total", "true"),
    ("lang_en", "lang = 'en'"),
    ("len_ok", f"size(toks) >= {_MIN_TOKENS}"),
    ("repetition_ok", f"({_DBF_SPARK.replace('bigrams', 'bg')}) <= {_DBF_MAX}"),
    ("stopword_ok", f"stop_ratio >= {_STOP_MIN}"),
]

_FUNNEL_STAGES_DUCK = [
    ("total", "true"),
    ("lang_en", "lang = 'en'"),
    ("len_ok", f"len(toks) >= {_MIN_TOKENS}"),
    ("repetition_ok", f"({_DBF_DUCK.replace('bigrams', 'bg')}) <= {_DBF_MAX}"),
    ("stopword_ok", f"stop_ratio >= {_STOP_MIN}"),
]


def _funnel_oracle() -> str:
    # cumulative-AND survivor count per stage, all from one agg row
    conds, selects = [], []
    for i, (name, cond) in enumerate(_FUNNEL_STAGES_DUCK):
        conds.append(cond)
        selects.append(
            f"SELECT {i} AS stage_no, '{name}' AS stage,"
            f" CAST(count_if({' AND '.join(conds)}) AS BIGINT) AS n FROM d"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH d AS (
  SELECT doc_id, lang, toks, {_BIGRAMS_DUCK} AS bg,
         len(list_filter(toks, x -> x IN ({_STOPWORDS_IN})))
           * 1.0 / len(toks) AS stop_ratio
  FROM (SELECT doc_id, lang, {_O_TOKS} AS toks FROM documents)
),
stages AS ({union}),
total AS (SELECT n AS tot FROM stages WHERE stage_no = 0)
SELECT stage_no, stage, n, round(n * 1.0 / tot, 6) AS frac
FROM stages, total
ORDER BY stage_no
"""


@workload("corpus_filter_funnel", oracle=_funnel_oracle())
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts through a cumulative curation funnel
    (language -> length -> repetition -> stopword-density), computed
    as conditional aggregates over a SINGLE corpus scan — stage
    counts at 100 TB cost one pass, not one pass per stage."""
    d = (
        _with_toks(_norm_docs(spark, sf_dir))
        .select(
            "doc_id",
            "lang",
            "toks",
            F.expr(_BIGRAMS_SPARK.replace("toks", "toks")).alias("bg"),
        )
        .withColumn(
            "stop_ratio",
            F.expr(f"size(filter(toks, x -> x IN ({_STOPWORDS_IN})))")
            * F.lit(1.0) / F.size("toks"),
        )
    )
    conds: list[str] = []
    aggs = []
    for i, (name, cond) in enumerate(_FUNNEL_STAGES):
        conds.append(cond)
        aggs.append(
            F.count_if(F.expr(" AND ".join(conds))).alias(f"s{i}")
        )
    row = d.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', s{i}" for i, (name, _) in enumerate(_FUNNEL_STAGES)
    )
    n_stage = len(_FUNNEL_STAGES)
    return (
        row.select(
            F.expr(
                f"stack({n_stage}, {stack_args}) AS (stage_no, stage, n)"
            ),
            F.col("s0").alias("tot"),
        )
        .select(
            F.col("stage_no").cast("int").alias("stage_no"),
            "stage",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * F.lit(1.0) / F.col("tot"), 6).alias("frac"),
        )
        .orderBy("stage_no")
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights per (source, lang).
# --------------------------------------------------------------------------

_MIX_TEMP = 0.7  # tokens^0.7, the multilingual-sampling convention


@workload(
    "corpus_mixture_weights",
    oracle=f"""
WITH g AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_O_TOKS})) AS BIGINT) AS tokens
  FROM documents
  GROUP BY source, lang
)
SELECT source, lang, n_docs, tokens,
       round(power(tokens, {_MIX_TEMP})
             / sum(power(tokens, {_MIX_TEMP})) OVER (), 6) AS weight
FROM g
ORDER BY source, lang
""",
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling weights per (source, lang) bucket: token counts
    scaled by temperature tokens^0.7 and normalized — the standard
    up-weighting of low-resource slices when composing a training
    mixture. The normalization window runs over the aggregate
    (|sources|x|langs| rows), never the corpus."""
    g = (
        _with_toks(_norm_docs(spark, sf_dir))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size("toks")).cast("bigint").alias("tokens"),
        )
    )
    w = Window.partitionBy()
    p = F.pow(F.col("tokens"), F.lit(_MIX_TEMP))
    return g.select(
        "source", "lang", "n_docs", "tokens",
        F.round(p / F.sum(p).over(w), 6).alias("weight"),
    ).orderBy("source", "lang")


# --------------------------------------------------------------------------
# Per-source token quota (batch twin of streaming_token_quota).
# --------------------------------------------------------------------------

_QUOTA_BUDGET = 800


@workload(
    "corpus_token_quota",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({_O_TOKS}) AS BIGINT) AS tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, tokens,
         CAST(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id)
           AS BIGINT) AS used_after
  FROM d
)
SELECT doc_id, source, tokens, used_after
FROM c WHERE used_after <= {_QUOTA_BUDGET}
ORDER BY source, doc_id
""",
)
def corpus_token_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution to the corpus at a token
    budget: keep a document iff the running per-source token total
    (in doc_id order, counting every doc) stays within budget —
    'truncate at overflow' semantics, identical to the streaming
    operator streaming/stateful.py::TokenQuotaProcessor (the parity
    test drives both). One window shuffle on source."""
    return _batch_token_quota(
        _norm_docs(spark, sf_dir), budget=_QUOTA_BUDGET
    )


def _batch_token_quota(docs: DataFrame, budget: int) -> DataFrame:
    toks = F.size(F.split("text", r"\s+"))
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select(
            "doc_id", "source", toks.cast("bigint").alias("tokens")
        )
        .withColumn(
            "used_after", F.sum("tokens").over(w).cast("bigint")
        )
        .filter(F.col("used_after") <= budget)
        .orderBy("source", "doc_id")
    )


# --------------------------------------------------------------------------
# PII redaction with deterministic injection + fingerprint proof.
# --------------------------------------------------------------------------

_EMAIL_PAT = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_PAT = "\\+1-555-[0-9]{4}"


@workload(
    "pii_redact_injected",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, source,
         lower(trim(text))
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_email,
         len(regexp_extract_all(text, '{_PHONE_PAT}')) AS n_phone,
         regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                        '{_PHONE_PAT}', '<PHONE>', 'g') AS clean
  FROM aug
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count_if(n_email > 0) AS BIGINT) AS email_docs,
       CAST(count_if(n_phone > 0) AS BIGINT) AS phone_docs,
       CAST(sum(n_email) AS BIGINT) AS emails_redacted,
       CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
       CAST(sum(len(regexp_extract_all(clean, '{_EMAIL_PAT}'))
                + len(regexp_extract_all(clean, '{_PHONE_PAT}')))
         AS BIGINT) AS residual_matches,
       bit_xor({_O_HASH.format(x='clean')}) AS clean_fingerprint
FROM red
GROUP BY source
ORDER BY source
""",
)
def pii_redact_injected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails + phone numbers) with
    deterministically injected fakes (the synthetic corpus has no
    real PII; both engines inject identically from doc_id).

    `residual_matches` must be 0 — the redacted text contains no
    remaining PII — and `clean_fingerprint` bit_xors a 60-bit md5 of
    every redacted document, proving byte-identical redaction across
    engines without shipping the text. Pure regexp expressions:
    whole-stage codegen, zero UDFs, no shuffle beyond the final
    per-source aggregate."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.lower(F.trim(F.col("text"))).alias("text")
    )
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    red = aug.select(
        "source",
        F.regexp_count("text", F.lit(_EMAIL_PAT)).alias("n_email"),
        F.regexp_count("text", F.lit(_PHONE_PAT)).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_PAT, "<EMAIL>"),
            _PHONE_PAT,
            "<PHONE>",
        ).alias("clean"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("n_email") > 0).cast("bigint").alias("email_docs"),
            F.count_if(F.col("n_phone") > 0).cast("bigint").alias("phone_docs"),
            F.sum("n_email").cast("bigint").alias("emails_redacted"),
            F.sum("n_phone").cast("bigint").alias("phones_redacted"),
            F.sum(
                F.regexp_count("clean", F.lit(_EMAIL_PAT))
                + F.regexp_count("clean", F.lit(_PHONE_PAT))
            ).cast("bigint").alias("residual_matches"),
            F.expr(f"bit_xor({_spark_hash('clean')})").alias(
                "clean_fingerprint"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Quality-weighted decile sampling (curriculum-style).
# --------------------------------------------------------------------------

_N_BINS = 10


@workload(
    "corpus_quality_bins",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         least(1.0, len(toks) / 100.0)
           * (0.5 + 0.5 * (len(list_filter(toks,
                x -> x IN ({_STOPWORDS_IN}))) * 1.0 / len(toks)))
           AS quality
  FROM (SELECT doc_id, {_O_TOKS} AS toks FROM documents)
),
binned AS (
  SELECT doc_id, quality,
         ntile({_N_BINS}) OVER (ORDER BY quality, doc_id) AS bin
  FROM scored
),
sampled AS (
  SELECT bin, doc_id, quality,
         ({_O_HASH.format(x="'qbin:' || doc_id")}) % 100
           < bin * {100 // _N_BINS} AS picked
  FROM binned
)
SELECT CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count_if(picked) AS BIGINT) AS n_sampled,
       round(min(quality), 6) AS q_min,
       round(max(quality), 6) AS q_max
FROM sampled
GROUP BY bin
ORDER BY bin
""",
)
def corpus_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-bin documents by the composite quality score, then
    sample each bin at a rate proportional to its bin index (top
    decile keeps ~100%, bottom ~10%) — quality-weighted sampling a la
    curriculum/QuRating-style data selection, with the md5-hash
    membership rule making the sample deterministic and rerun-stable
    (same property as the stratified sampler).

    ntile's ORDER BY carries a doc_id tiebreak so bin edges are
    total-ordered — identical across engines and partitionings. The
    global sort is one shuffle over (quality, doc_id) pairs only."""
    docs = _with_toks(_norm_docs(spark, sf_dir))
    n_tokens = F.size("toks")
    stop_hits = F.expr(f"size(filter(toks, x -> x IN ({_STOPWORDS_IN})))")
    quality = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        * (F.lit(0.5) + F.lit(0.5) * (stop_hits * F.lit(1.0) / n_tokens))
    )
    w = Window.orderBy("quality", "doc_id")
    binned = (
        docs.select("doc_id", quality.alias("quality"))
        .withColumn("bin", F.ntile(_N_BINS).over(w))
    )
    picked = (
        F.expr(_spark_hash("concat('qbin:', doc_id)")) % 100
        < F.col("bin") * (100 // _N_BINS)
    )
    return (
        binned.withColumn("picked", picked)
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("picked")).cast("bigint").alias("n_sampled"),
            F.round(F.min("quality"), 6).alias("q_min"),
            F.round(F.max("quality"), 6).alias("q_max"),
        )
        .orderBy("bin")
    )


@workload(
    "export_shard_manifest",
    oracle=f"""
SELECT CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            % 8 AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
            AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY shard
""",
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export path's budget manifest, oracle-verified: the same
    deterministic md5 shard assignment `operators/export.py` writes
    with (hash(doc_id) % 8), aggregated to per-shard docs / tokens /
    chars. Because assignment is a pure function of the row key, the
    manifest — and the shard layout it describes — is identical
    across engines, reruns, and cluster sizes; an incremental
    re-export moves only new docs."""
    from datanika_core_spark.operators.export import assign_shard

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint").alias("dl"),
    )
    sharded = assign_shard(docs, "doc_id", 8)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# Source-concentration Gini coefficient (corpus inequality measure).
# --------------------------------------------------------------------------


@workload(
    "corpus_gini_concentration",
    oracle="""
WITH mass AS (
  SELECT source,
         sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
           AS toks
  FROM documents GROUP BY source
),
ranked AS (
  SELECT toks,
         row_number() OVER (ORDER BY toks, source) AS i,
         count(*) OVER () AS n,
         sum(toks) OVER () AS total
  FROM mass
)
SELECT CAST(max(n) AS BIGINT) AS n_sources,
       CAST(max(total) AS BIGINT) AS total_tokens,
       ROUND(2.0 * sum(i * toks) / (max(n) * max(total))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked
""",
)
def corpus_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of token mass across sources — the single
    number that says whether the corpus blend is balanced (→0) or a
    few domains dominate (→1); the alarm a data-mixing pipeline
    watches as crawls grow unevenly (complements
    corpus_mixture_weights, which fixes the imbalance this detects).

    Scale: per-source mass is a combiner agg; the rank/total windows
    run over |sources| rows. Deterministic tie order (toks, source)
    keeps the rank — and hence the statistic — rerun-stable."""
    from pyspark.sql import Window

    mass = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            ).alias("toks")
        )
    )
    ranked = mass.select(
        "toks",
        F.row_number()
        .over(Window.orderBy("toks", "source"))
        .alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("toks").over(Window.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_sources"),
        F.max("total").cast("bigint").alias("total_tokens"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("toks"))
            / (F.max("n") * F.max("total"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers.
# --------------------------------------------------------------------------

_KA_K = 5  # minimum acceptable equivalence-class size


@workload(
    "privacy_k_anonymity",
    oracle=f"""
WITH classes AS (
  SELECT event_type,
         date_trunc('day', ts) AS day,
         CAST(floor(value / 50) AS BIGINT) AS value_band,
         count(*) AS class_size
  FROM events
  GROUP BY event_type, day, value_band
)
SELECT CAST({_KA_K} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN class_size < {_KA_K} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_violating_classes,
       CAST(sum(CASE WHEN class_size < {_KA_K} THEN class_size ELSE 0 END)
         AS BIGINT) AS rows_at_risk,
       ROUND(sum(CASE WHEN class_size < {_KA_K} THEN class_size ELSE 0 END)
             * 1.0 / sum(class_size), 6) AS at_risk_frac
FROM classes
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group the release candidate by its
    quasi-identifier tuple (event type, day, 50-unit value band) and
    report how many equivalence classes fall below k=5 members and
    what fraction of rows they expose — the re-identification gate a
    dataset passes before leaving the platform (the PII regex scrub
    above removes direct identifiers; this measures the INDIRECT
    ones). rows_at_risk > 0 means suppress or generalize those
    classes before release.

    Scale: one combiner-friendly groupBy on the QI tuple + a 1-row
    rollup — runs at any corpus size; the QI choice is the knob, the
    plan shape never changes."""
    ev = t(spark, sf_dir, "events")
    classes = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") / 50).cast("bigint").alias("value_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    viol = F.when(F.col("class_size") < _KA_K, F.col("class_size")).otherwise(0)
    return classes.agg(
        F.lit(_KA_K).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum((F.col("class_size") < _KA_K).cast("int"))
        .cast("bigint")
        .alias("n_violating_classes"),
        F.sum(viol).cast("bigint").alias("rows_at_risk"),
        F.round(
            F.sum(viol) * F.lit(1.0) / F.sum("class_size"), 6
        ).alias("at_risk_frac"),
    )


# --------------------------------------------------------------------------
# l-diversity audit (sensitive-attribute diversity per QI class).
# --------------------------------------------------------------------------

_LD_L = 3  # minimum distinct sensitive values per equivalence class


@workload(
    "privacy_l_diversity",
    oracle=f"""
WITH classes AS (
  SELECT event_type,
         date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive
  FROM events
  GROUP BY event_type, day
)
SELECT CAST({_LD_L} AS BIGINT) AS l,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n_sensitive) AS BIGINT) AS min_diversity,
       CAST(sum(CASE WHEN n_sensitive < {_LD_L} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_violating_classes,
       CAST(sum(CASE WHEN n_sensitive < {_LD_L} THEN class_size ELSE 0 END)
         AS BIGINT) AS rows_at_risk,
       ROUND(sum(CASE WHEN n_sensitive < {_LD_L} THEN class_size ELSE 0 END)
             * 1.0 / sum(class_size), 6) AS at_risk_frac
FROM classes
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    complement k-anonymity misses: a class can be large (k-safe) yet
    have every member share ONE sensitive value, so membership alone
    discloses it. Group by the quasi-identifier tuple (event type,
    day), count DISTINCT sensitive values (user_id stands in for the
    sensitive attribute), and report classes below l = {l} and the
    row mass they expose — the homogeneity-attack gate that runs
    alongside privacy_k_anonymity before a release.

    Scale: one groupBy with a COUNT DISTINCT per class — map-side
    partial distinct on (QI, sensitive), then the class rollup; swap
    the exact distinct for the HLL register sketch
    (operators/hll_store.py) when the sensitive domain per class
    outgrows memory — the audit thresholds on "at least l", which a
    ±13% m=64 estimate answers for any l ≪ class sizes."""
    ev = t(spark, sf_dir, "events")
    classes = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.count_distinct("user_id").cast("bigint").alias("n_sensitive"),
        )
    )
    risk = F.when(
        F.col("n_sensitive") < _LD_L, F.col("class_size")
    ).otherwise(0)
    return classes.agg(
        F.lit(_LD_L).cast("bigint").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("n_sensitive").cast("bigint").alias("min_diversity"),
        F.sum((F.col("n_sensitive") < _LD_L).cast("int"))
        .cast("bigint")
        .alias("n_violating_classes"),
        F.sum(risk).cast("bigint").alias("rows_at_risk"),
        F.round(
            F.sum(risk) * F.lit(1.0) / F.sum("class_size"), 6
        ).alias("at_risk_frac"),
    )


privacy_l_diversity.__doc__ = privacy_l_diversity.__doc__.format(l=_LD_L)
