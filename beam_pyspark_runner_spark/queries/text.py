"""Text-analysis operators over the ``documents`` table.

North-star LLM-data surface (SURVEY.md §2.4): language-ID heuristics,
quality scoring, token counting, document fingerprinting. The reference
would run these as per-element Python DoFns
(``/root/reference/beam_pyspark_runner/transform_evaluators.py:28-79``);
here everything stays JVM-side in whole-stage codegen — string splits,
higher-order array functions, and regex all vectorize, so a 100 TB
documents corpus never crosses into Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.functions.hashing import h32_sql
from beam_pyspark_runner_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table

# Stopword list shared verbatim with the oracle SQL.
STOPWORDS = ("the", "a")
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


@register(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, lang,
           n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS ttr,
           CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio
    FROM t
    """,
    tags=("text_analysis", "quality_score", "pardo_map"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats: token count, type-token ratio, stopword
    ratio. All array ops are codegen'd; no shuffle (narrow map-only plan)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_unique = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        (n_unique.cast("double") / n_tokens.cast("double")).alias("ttr"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    )


@register(
    "token_count_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_letters
    FROM documents
    """,
    tags=("text_analysis", "token_count", "regex"),
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer proxy: regex token extraction, JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
        .cast("long")
        .alias("n_word_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]"), 0))
        .cast("long")
        .alias("n_letters"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
           COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM documents GROUP BY 1
    """,
    tags=("text_analysis", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over normalized text (lower + whitespace
    collapse); grouping by fingerprint is the first stage of exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                 CAST(len(list_filter(toks, x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS en_ratio
          FROM t)
    SELECT doc_id, lang,
           CASE WHEN sw_ratio + en_ratio > 0.12 THEN 'en_like' ELSE 'other' END AS lang_guess
    FROM s
    """,
    tags=("text_analysis", "lang_id"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic (the real thing would use a
    fastText-style model via a pandas UDF; the Spark plumbing is the same)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    en = F.size(F.filter(toks, lambda x: x.isin("data", "query", "table"))).cast("double") / n
    return d.select(
        "doc_id",
        "lang",
        F.when(sw + en > 0.12, "en_like").otherwise("other").alias("lang_guess"),
    )


@register(
    "lang_distribution",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n_docs, {davg_sql('n_chars')} AS avg_chars
    FROM documents GROUP BY lang, source
    """,
    tags=("text_analysis", "aggregate"),
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), davg("n_chars").alias("avg_chars")
    )


@register(
    "quality_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, source, n_chars,
                      string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang, source, n_chars,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS ttr,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS stopword_ratio
          FROM t)
    SELECT doc_id, lang, source, n_tokens, ttr, stopword_ratio
    FROM s
    WHERE n_tokens BETWEEN 10 AND 5000
      AND ttr >= 0.3
      AND stopword_ratio <= 0.5
    """,
    tags=("text_analysis", "quality_score", "filter"),
    bench=True,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality gate: keep documents passing length, lexical
    diversity (type-token ratio), and stopword-density thresholds — the
    filter stage a 100 TB corpus pipeline runs before dedup. Pure narrow
    plan: no shuffle, all predicates evaluated in whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast(
        "double"
    ) / n_tokens.cast("double")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            n_tokens.alias("n_tokens"),
            ttr.alias("ttr"),
            sw.alias("stopword_ratio"),
        )
        .filter(
            F.col("n_tokens").between(10, 5000)
            & (F.col("ttr") >= 0.3)
            & (F.col("stopword_ratio") <= 0.5)
        )
    )


@register(
    "pandas_udf_density_score",
    # Exact-arithmetic score (int count, one float divide) so the Arrow
    # round-trip is verifiable bit-for-bit against the SQL oracle.
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) * 1000 AS DOUBLE)
               / CAST(n_chars + 1 AS DOUBLE) AS density
    FROM documents
    """,
    tags=("text_analysis", "pandas_udf", "arrow"),
)
def pandas_udf_density_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow-batched): token density per
    document, computed in Python. This is the sanctioned shape for logic
    that genuinely needs Python (model scoring, tokenizers): one Arrow
    batch per ~10k rows (session.py), no per-row pickling. The oracle
    proves the Python path returns exactly what the SQL engine computes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def density(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        n_tokens = text.str.split(" ").map(len)
        return n_tokens * 1000.0 / (n_chars + 1.0)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", density("text", "n_chars").alias("density"))


@register(
    "pipeline_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
    tags=("pipeline_api", "flat_map", "count_per_element", "group_by_key"),
)
def pipeline_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's own wordcount demo (README.md:47-55), run
    through this engine's Beam-style Pipeline API end-to-end — proving the
    dataflow surface lowers to the same oracle-correct Catalyst plan as
    the plain DataFrame queries (flat_map → explode, count_per_element →
    groupBy.count, all codegen'd)."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    return (
        p.from_df(load_table(spark, sf_dir, "documents").select("text"))
        .flat_map(F.split(F.col("text"), " "), out="token")
        .count_per_element(value="token")
        .select(F.col("key").alias("token"), F.col("value").alias("n_occurrences"))
        .to_df()
    )


@register(
    "metrics_counters",
    oracle="""
    SELECT 'pardo' AS namespace, 'chars.count' AS metric,
           CAST(COUNT(*) AS DOUBLE) AS value FROM documents
    UNION ALL
    SELECT 'pardo', 'chars.max', CAST(MAX(n_chars) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'pardo', 'chars.min', CAST(MIN(n_chars) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'pardo', 'chars.sum', CAST(SUM(n_chars) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'pardo', 'rows_processed', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'pipeline', 'scan.docs_read', CAST(COUNT(*) AS DOUBLE) FROM documents
    UNION ALL
    SELECT 'pipeline', 'scan.long_docs',
           CAST(SUM(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS DOUBLE)
    FROM documents
    """,
    tags=("metrics", "counters", "accumulator", "observe", "pipeline_api"),
)
def metrics_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics/counters surface (reference stub: pyspark_runner.py:30-31
    raises NotImplementedError). Exercises BOTH Spark-native channels end
    to end: ``observe`` aggregates on the codegen path (docs_read /
    long_docs piggyback on the action, zero extra jobs) and
    accumulator-backed Counter/Distribution incremented inside a par_do
    Arrow kernel (Beam's Metrics.counter-in-DoFn model). One action
    materializes the pipeline; the returned frame is the metrics
    snapshot itself, verified against plain SQL over the same table —
    counter cardinality is program-bounded, so the snapshot is
    constant-size at any data scale."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    rows_c = p.counter("pardo", "rows_processed")
    chars_d = p.distribution("pardo", "chars")

    def kernel(batches):
        for pdf in batches:
            if len(pdf):
                rows_c.inc(len(pdf))
                chars_d.update_agg(
                    len(pdf),
                    int(pdf["n_chars"].sum()),
                    int(pdf["n_chars"].min()),
                    int(pdf["n_chars"].max()),
                )
            yield pdf[["doc_id"]]

    out = (
        p.from_df(load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"))
        .observe(
            "pipeline",
            "scan",
            F.count(F.lit(1)).alias("docs_read"),
            F.sum(F.when(F.col("n_chars") > 500, 1).otherwise(0)).alias("long_docs"),
        )
        .par_do(kernel, "doc_id bigint")
    )
    out.to_df().count()  # the action: populates observe + accumulators
    return p.metrics.to_df()


_SCALE_SCHEMA = "doc_id bigint, source string, n_chars bigint, scaled double"


def _minmax_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: min-max scale n_chars within one source group.
    Integer min/max + one float divide — deterministic in any row order."""
    lo = int(pdf["n_chars"].min())
    hi = int(pdf["n_chars"].max())
    span = float(hi - lo) if hi > lo else 1.0
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "n_chars": pdf["n_chars"],
            "scaled": (pdf["n_chars"] - lo) / span,
        }
    )


@register(
    "grouped_pandas_minmax",
    oracle="""
    WITH stats AS (
        SELECT source, MIN(n_chars) AS lo, MAX(n_chars) AS hi
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CAST(d.n_chars - lo AS DOUBLE)
               / (CASE WHEN hi > lo THEN CAST(hi - lo AS DOUBLE) ELSE 1.0 END) AS scaled
    FROM documents d JOIN stats USING (source)
    """,
    tags=("pandas_udf", "apply_in_pandas", "grouped_map", "text_analysis"),
)
def grouped_pandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the batch DoFn-per-key shape): each
    source group arrives as one pandas frame, is normalized in Python,
    and returns rows. This is the sanctioned pattern for per-group Python
    logic that needs the whole group at once (normalization, per-group
    model fit). Caveat at 100 TB: one group must fit one worker's memory
    — for unbounded groups prefer the two-pass stats-join form the oracle
    uses (which is also the JVM-only fast path)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return d.groupBy("source").applyInPandas(_minmax_kernel, _SCALE_SCHEMA)


@register(
    "udtf_token_positions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS pos,
           t[i] AS token,
           CAST(length(t[i]) AS BIGINT) AS token_len
    FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS r(i)
    """,
    tags=("udtf", "table_function", "text_analysis"),
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row → N output
    rows with per-row Python logic, consumed via LATERAL join. The
    reference's closest analogue is a multi-yield DoFn
    (transform_evaluators.py:62-68); here the UDTF is registered in SQL
    and composes with any query. Arrow-batched like other Python paths;
    for pure tokenization the JVM explode(split()) twin is faster — the
    UDTF earns its cost when per-row logic is genuinely Python (real
    tokenizers, parsers)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string, token_len bigint")
    class TokenPositions:
        def eval(self, text: str):
            for pos, tok in enumerate(text.split(" ")):
                yield pos, tok, len(tok)

    spark.udtf.register("token_positions", TokenPositions)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM docs_udtf d, LATERAL token_positions(d.text) t
        """
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC,
                            tf.term
               ) AS rn
        FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, tf, df, score FROM scored WHERE rn <= 3
    """,
    tags=("text_analysis", "tfidf", "top_k_per_key", "join", "window"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (linear inverse-
    frequency variant: score = tf / df). The linear form keeps the score
    a single int÷int double division — correctly rounded and therefore
    bit-identical on both engines, where a log-based idf would drift by
    1 ulp between libm implementations. Ties break on the term string,
    so the top-3 set is fully deterministic.

    Scale: single-pass — tf is one (doc, term) shuffle, then df comes
    from a COUNT window over term ON THE TF ROWS (tf has exactly one row
    per (doc, term), so the partition count IS the document frequency),
    then the top-3 rank windows on doc. Three keyed shuffles of compact
    int pairs, never document text, and the token-explode lineage runs
    once — the join formulation (tf ⋈ df-aggregate) recomputes it twice
    and doubles the shuffles (pinned by test_tfidf_shuffle_budget).
    Vocabulary is Zipfian, so AQE's skew split handles the
    stopword-heavy term partitions."""
    from pyspark.sql import Window as W

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = F.count("*").over(W.partitionBy("term"))
    score = F.col("tf").cast("double") / F.col("df").cast("double")
    w = W.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.withColumn("df", df)
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    starts AS (
        SELECT doc_id, toks,
               unnest(range(0, GREATEST(len(toks), 1), {CHUNK_STRIDE})) AS s
        FROM t
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, s + 1, s + {CHUNK_TOKENS})) AS BIGINT)
               AS n_chunk_tokens,
           array_to_string(list_slice(toks, s + 1, s + {CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM starts
    """,
    tags=("text_analysis", "chunking", "flat_map", "array_fns"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document becomes overlapping
    {CHUNK_TOKENS}-token chunks every {CHUNK_STRIDE} tokens — the
    standard LLM training/RAG preprocessing step. Pure codegen: split →
    sequence of starts → explode → slice → re-join; the 1→N expansion
    happens executor-side with no Python, and chunk boundaries depend
    only on token counts, so the oracle is exact. At 100 TB the explode
    multiplies rows ~n_tokens/stride× — run it AFTER quality filtering
    and dedup (clean_corpus's filter→dedup stages), never before."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS)
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


TRAIN_PCT = 90  # hash-split percentage for the train split


@register(
    "train_val_split",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN (('0x' || substr(md5('split-' || doc_id), 1, 8))::BIGINT)
                         % 100 < {TRAIN_PCT}
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang
    """,
    tags=("text_analysis", "split", "sampling", "hashing"),
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split: membership = md5(key) mod 100, no
    RNG — the split is a pure function of the document id, so it is
    reproducible across runs, cluster sizes, and engines (the property
    a training pipeline needs for resumable preprocessing and honest
    eval). Narrow map + one small aggregate; at 100 TB the assignment
    costs one hash per row and the split ratio holds to CLT tolerance."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents")
    split = F.when(
        h32(F.concat_ws("-", F.lit("split"), F.col("doc_id"))) % 100 < TRAIN_PCT,
        "train",
    ).otherwise("val")
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


PACK_TOKEN_BUDGET = 2048  # tokens per packed training sequence


@register(
    "pack_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT lang,
           CAST((cum - n_tokens) // {PACK_TOKEN_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM c GROUP BY 1, 2
    """,
    tags=("text_analysis", "packing", "window", "aggregate"),
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-and-split style: documents stream in
    deterministic (lang, doc_id) order, a running token count assigns
    each document to the training sequence its first token lands in
    (seq = floor(preceding_tokens / {PACK_TOKEN_BUDGET})) — the
    GPT-style pack-then-chop batching that wastes no pad tokens.

    Scale: the running sum partitions by lang, so parallelism = number
    of streams; a production packer shards further (e.g. by
    hash-bucketed shard keys) because any contiguous packing is
    inherently sequential WITHIN a stream — that per-stream sequential
    scan is the honest cost of deterministic packing, and it runs
    executor-side here (one window, no driver loop)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens(F.col("text"))).cast("long")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = d.select("doc_id", "lang", n_tokens.alias("n_tokens")).withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    return (
        c.groupBy(
            "lang",
            ((F.col("cum") - F.col("n_tokens")) / PACK_TOKEN_BUDGET)
            .cast("long")
            .alias("seq_id"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )


SOURCE_QUOTA = 40  # docs kept per source in the balanced mixture


@register(
    "source_quota_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY (('0x' || substr(md5('mix-' || doc_id), 1, 8))::BIGINT),
                            doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source, lang FROM ranked WHERE rn <= {SOURCE_QUOTA}
    """,
    tags=("text_analysis", "sampling", "mixture", "top_k_per_key"),
)
def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture balancing: keep a fixed quota of documents per
    source, chosen by deterministic hash rank (md5 order, doc_id
    tie-break) — equal-weight mixing of heterogeneous sources without
    RNG, reproducible at any scale. The hash rank is a uniform shuffle
    of each source, so the quota is an unbiased sample. One shuffle on
    source with map-side WindowGroupLimit pushing the top-{SOURCE_QUOTA}
    into each input partition."""
    from pyspark.sql import Window as W
    from beam_pyspark_runner_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents")
    hrank = h32(F.concat_ws("-", F.lit("mix"), F.col("doc_id")))
    w = W.partitionBy("source").orderBy(hrank, F.col("doc_id"))
    return (
        d.select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_QUOTA)
        .select("doc_id", "source", "lang")
    )


from beam_pyspark_runner_spark.queries.dedup import _CLEAN_SQL as _CLEAN_CORPUS_SQL


@register(
    "corpus_to_training_set",
    oracle=f"""
    WITH {_CLEAN_CORPUS_SQL},
    base AS (
        SELECT d.doc_id, d.lang,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(range(0, GREATEST(len(string_split(d.text, ' ')), 1),
                              {CHUNK_STRIDE})) AS BIGINT) AS n_chunks,
               CASE WHEN (('0x' || substr(md5('split-' || d.doc_id), 1, 8))::BIGINT)
                         % 100 < {TRAIN_PCT}
                    THEN 'train' ELSE 'val' END AS split
        FROM documents d JOIN survivors USING (doc_id)
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM base GROUP BY split, lang
    """,
    tags=("text_analysis", "pipeline", "dedup", "split", "chunking"),
)
def corpus_to_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — the full corpus-to-training-set pipeline in
    one declarative plan: quality gate → exact dedup → MinHash-LSH
    near-dup drop (clean_corpus's stages) → deterministic hash split →
    chunk accounting, reported as per-(split, lang) doc/chunk/token
    totals. Every stage is the already-oracle-checked operator; the
    point here is that they COMPOSE into one Catalyst plan — filters
    still push down, the survivor join is an id-only anti-join chain,
    and nothing materializes between stages. This is the query a 100 TB
    preprocessing run executes before writing packed shards."""
    from beam_pyspark_runner_spark.queries.dedup import clean_corpus

    survivors = clean_corpus(spark, sf_dir)
    from beam_pyspark_runner_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_chunks = F.size(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    ).cast("long")
    split = F.when(
        h32(F.concat_ws("-", F.lit("split"), F.col("doc_id"))) % 100 < TRAIN_PCT,
        "train",
    ).otherwise("val")
    return (
        d.join(survivors, "doc_id")
        .select(
            split.alias("split"),
            "lang",
            n_tokens.alias("n_tokens"),
            n_chunks.alias("n_chunks"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# --- PII redaction -----------------------------------------------------------
# Regex patterns shared verbatim between the Spark plan and the DuckDB
# oracle (both are RE2/Java-compatible subsets: no lookaround, no
# backreferences, so the two engines match identical spans).
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
    tags=("text_analysis", "pii", "redaction", "regex"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass every training-data pipeline runs
    before anything else. The fixture corpus contains no PII, so the query
    first synthesizes a deterministic email + phone suffix per document
    (making the redaction provably fire on every row), then counts and
    masks the matches. Everything is JVM regex inside whole-stage codegen:
    a narrow map-only plan with zero shuffles, which is exactly the shape
    this op must keep at 100 TB (reference would run it as a per-element
    Python DoFn: transform_evaluators.py:28-79)."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
    )
    aug = d.select("doc_id", raw.alias("raw"))
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


@register(
    "repetition_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n,
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1]) AS bigrams
          FROM t WHERE len(toks) >= 2),
    s AS (SELECT doc_id,
                 CAST(list_max(list_transform(list_distinct(toks),
                          u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
                     / CAST(n AS DOUBLE) AS top_token_ratio,
                 CAST(len(list_distinct(bigrams)) AS DOUBLE)
                     / CAST(len(bigrams) AS DOUBLE) AS bigram_ttr
          FROM b)
    SELECT doc_id, top_token_ratio, bigram_ttr,
           CASE WHEN top_token_ratio <= 0.2 AND bigram_ttr >= 0.85
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM s
    """,
    tags=("text_analysis", "quality_score", "repetition", "higher_order_fns"),
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: most-frequent-token ratio
    and distinct-bigram ratio, with a keep/drop verdict. Stays a narrow
    map-only plan: token and bigram statistics are computed with array
    higher-order functions inside the row (O(distinct x tokens) per doc,
    bounded by document length) instead of explode + groupBy, so a 100 TB
    corpus pays zero shuffle for its quality pass. Ratios are int/int
    double divisions — bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda u: F.size(F.filter(F.col("toks"), lambda x: x == u)),
        )
    )
    bigrams = F.transform(
        F.slice("toks", 1, n - 1),
        lambda x, i: F.concat_ws(" ", x, F.get("toks", i + 1)),
    )
    s = t.select(
        "doc_id",
        (top_cnt.cast("double") / n.cast("double")).alias("top_token_ratio"),
        (
            F.size(F.array_distinct(bigrams)).cast("double")
            / F.size(bigrams).cast("double")
        ).alias("bigram_ttr"),
    )
    return s.select(
        "doc_id",
        "top_token_ratio",
        "bigram_ttr",
        F.when(
            (F.col("top_token_ratio") <= 0.2) & (F.col("bigram_ttr") >= 0.85), "keep"
        )
        .otherwise("drop")
        .alias("verdict"),
    )


class _SplitFieldsUDTF:
    """Polymorphic UDTF: output schema computed at plan time by
    ``analyze()`` from the literal width argument (Spark 4, SPARK-44503)
    — the capability that makes a Python UDTF a real table function
    rather than a fixed-shape explode."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        num = int(n.value)
        return AnalyzeResult(
            StructType([StructField(f"t{i}", StringType()) for i in range(num)])
        )

    def eval(self, text: str, n: int):
        toks = (text or "").split(" ")
        yield tuple(toks[i] if i < len(toks) else None for i in range(n))


@register(
    "udtf_dynamic_split",
    oracle="""
    SELECT doc_id,
           list_extract(string_split(text, ' '), 1) AS t0,
           list_extract(string_split(text, ' '), 2) AS t1,
           list_extract(string_split(text, ' '), 3) AS t2
    FROM documents
    """,
    tags=("udtf", "analyze", "lateral", "text_analysis"),
)
def udtf_dynamic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with plan-time ``analyze()``: the output columns (t0..t2)
    exist because the call site passes width=3 — schema is a function of
    the arguments, resolved before execution, so Catalyst prunes and
    codegens around it like any relation. The reference's DoFn surface
    has no analogue (every output is an opaque element)."""
    from pyspark.sql.functions import udtf as udtf_fn

    spark.udtf.register("split_fields", udtf_fn(_SplitFieldsUDTF))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.t0, s.t1, s.t2 "
        "FROM docs_udtf d, LATERAL split_fields(d.text, 3) s"
    )


BPE_TOP_PAIRS = 20


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
    pairs AS (
      SELECT substring(w, CAST(i AS INT), 2) AS pair, freq
      FROM (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
            FROM wc WHERE length(w) >= 2)
    ),
    totals AS (SELECT pair, SUM(freq) AS total FROM pairs GROUP BY pair)
    SELECT pair, total, rnk FROM (
      SELECT pair, CAST(total AS BIGINT) AS total,
             ROW_NUMBER() OVER (ORDER BY total DESC, pair) AS rnk
      FROM totals
    ) WHERE rnk <= {BPE_TOP_PAIRS}
    """,
    tags=("bounded_window", "text_analysis", "tokenizer", "bpe", "vocab"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration (Sennrich et al. 2016): count adjacent
    symbol pairs across the corpus and rank the merge candidates — the
    inner loop of tokenizer training, as a Catalyst plan.

    The classic BPE scaling trick is built in: pairs are counted over
    the *word-frequency table*, not the raw token stream, so the pair
    stage's input is the vocabulary (~1e5 rows at any corpus size, with
    counts carrying the corpus weight) rather than the corpus itself.
    Two shuffles total: word→freq, pair→total; the pair expansion is a
    per-word HOF (sequence + substring), pure codegen, no Python.
    At 100 TB the word-count stage is the only corpus-wide pass —
    identical shape to pipeline_wordcount — and subsequent merge
    iterations would re-run only the vocab-sized stages. The final
    top-{BPE_TOP_PAIRS} cut is a TakeOrdered heap; the rank window
    runs only over the bounded heap result (bounded_window)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)).alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
    )
    totals = pairs.groupBy("pair").agg(F.sum("freq").alias("total"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("total").desc(), F.col("pair"))
    top = totals.orderBy(F.col("total").desc(), F.col("pair")).limit(
        BPE_TOP_PAIRS
    )
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("pair", F.col("total").cast("long").alias("total"),
                F.col("rnk").cast("long").alias("rnk"))
    )


# --- count-based bigram language model (add-k smoothing) --------------------
LM_K = 0.5  # add-k smoothing constant
LM_MIN_PAIR = 5  # emit bigrams seen at least this often


@register(
    "bigram_lm_probs",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bi AS (
        SELECT t[i] AS head, t[i + 1] AS tail
        FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM toks)
    ),
    pair AS (SELECT head, tail, COUNT(*) AS pair_count FROM bi GROUP BY head, tail),
    ctx AS (SELECT head, CAST(SUM(pair_count) AS BIGINT) AS head_count FROM pair GROUP BY head),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab
          FROM (SELECT UNNEST(t) AS tok FROM toks))
    SELECT p.head, p.tail, p.pair_count, c.head_count,
           (CAST(p.pair_count AS DOUBLE) + {LM_K})
             / (CAST(c.head_count AS DOUBLE) + {LM_K} * CAST(v.vocab AS DOUBLE))
             AS cond_prob
    FROM pair p JOIN ctx c ON p.head = c.head, v
    WHERE p.pair_count >= {LM_MIN_PAIR}
    """,
    tags=("text", "ngram", "language_model", "smoothing"),
)
def bigram_lm_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM: add-k smoothed conditional probabilities.

    The building block of KenLM-style data scoring (perplexity filters
    rank documents by how "natural" a reference LM finds them). All
    arithmetic is integer counts plus one IEEE division — deliberately
    no log(): libm log differs by ulps across engines, division does not,
    so the probabilities value-hash exactly.

    Scale notes (100 TB): corpus-sized work is one explode + one partial
    agg keyed on (head, tail) — Catalyst map-side-combines the skewed
    stopword pairs before the shuffle. Context totals derive from the
    (vocab²-bounded) pair table, not a second corpus pass; the vocab
    scalar broadcasts via a 1-row cross join.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        _tokens(F.col("text")).alias("t")
    )
    bi = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("head"),
                    F.element_at("t", i + 1).alias("tail"),
                ),
            )
        ).alias("b")
    ).select("b.head", "b.tail")
    pair = bi.groupBy("head", "tail").agg(F.count("*").alias("pair_count"))
    ctx = pair.groupBy("head").agg(F.sum("pair_count").alias("head_count"))
    vocab = toks.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").alias("vocab")
    )
    return (
        pair.filter(F.col("pair_count") >= LM_MIN_PAIR)
        .join(ctx, "head")
        .crossJoin(F.broadcast(vocab))
        .select(
            "head", "tail", "pair_count", "head_count",
            (
                (F.col("pair_count").cast("double") + F.lit(LM_K))
                / (
                    F.col("head_count").cast("double")
                    + F.lit(LM_K) * F.col("vocab").cast("double")
                )
            ).alias("cond_prob"),
        )
    )


# --- temperature-weighted source mixing -------------------------------------
MIX_ALPHA = 0.5  # mixing temperature: w_s ∝ n_s^alpha (sqrt scaling)


@register(
    "mixture_weights",
    oracle=f"""
    WITH s AS (SELECT source, COUNT(*) AS n_docs,
                      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
               FROM documents GROUP BY source),
    t AS (SELECT CAST(ROUND(SUM(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,10))), 2)
                      AS DOUBLE) AS denom,
                 CAST(SUM(n_docs) AS BIGINT) AS total_docs
          FROM s)
    SELECT source, n_docs, n_tokens,
           sqrt(CAST(n_docs AS DOUBLE)) / denom AS sample_weight,
           sqrt(CAST(n_docs AS DOUBLE)) / denom
             * CAST(total_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS epochs
    FROM s, t
    """,
    tags=("text", "mixture", "sampling", "training_set"),
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing: w_s ∝ n_s^α (α=0.5).

    The multinomial-sampling weights used to rebalance web-scale corpora
    (upweight small high-quality sources, downweight the crawl; the α<1
    temperature trick from multilingual LM training). `epochs` is the
    implied per-source repeat factor under the reweighted mix. sqrt and
    divide are correctly-rounded IEEE ops, and the cross-source
    normalizer folds through exact decimal summation (functions/
    numeric.py:dsum discipline) — bit-identical across engines and
    partitionings.

    Scale notes: one corpus aggregation keyed by source (map-side
    combined), then a 20-row broadcast of the normalizer. At 100 TB the
    weights table feeds `source_quota_sample`'s hash-rank sampler.
    """
    from beam_pyspark_runner_spark.functions.numeric import dsum

    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_tokens(F.col("text"))).cast("bigint")).alias("n_tokens"),
        )
    )
    t = s.agg(
        dsum(F.sqrt(F.col("n_docs").cast("double"))).alias("denom"),
        F.sum("n_docs").alias("total_docs"),
    )
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("denom")
    return s.crossJoin(F.broadcast(t)).select(
        "source", "n_docs", "n_tokens",
        w.alias("sample_weight"),
        (w * F.col("total_docs").cast("double") / F.col("n_docs").cast("double")
         ).alias("epochs"),
    )


# --- vocabulary id-encoding (tokenizer-apply stage) -------------------------
VOCAB_SIZE = 1000  # frequency-ranked vocabulary; everything else → UNK (-1)


@register(
    "vocab_id_encode",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (
        SELECT doc_id, i AS pos, toks[i] AS token
        FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks) + 1)) AS i FROM t)
    ),
    counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    vocab AS (
        SELECT token, id FROM (
            SELECT token,
                   ROW_NUMBER() OVER (ORDER BY c DESC, token) - 1 AS id
            FROM counts
        ) WHERE id < {VOCAB_SIZE}
    ),
    enc AS (
        SELECT tok.doc_id, tok.pos, COALESCE(v.id, -1) AS id
        FROM tok LEFT JOIN vocab v USING (token)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
    FROM enc GROUP BY doc_id
    """,
    tags=("bounded_window", "text", "tokenizer", "vocab", "training_data"),
)
def vocab_id_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply: map every token to its frequency-ranked vocab id
    (top VOCAB_SIZE; out-of-vocab → -1) and re-assemble each document as
    its id sequence — the text→ids stage every training pipeline runs
    after tokenizer training (`bpe_pair_counts` is the training half).

    Scale notes (100 TB): the vocabulary is corpus-derived but tiny
    (VOCAB_SIZE rows) — it broadcasts into the encode join, so the
    corpus-sized path is explode → broadcast-hash-join → one groupBy
    doc_id with an in-group sort (array_sort of (pos, id) structs), all
    JVM-side. The top-VOCAB_SIZE cut is a TakeOrdered heap over the
    token-type table; the id-assignment window then ranks only the
    bounded VOCAB_SIZE-row heap output, never the full type table. Ids serialize to CSV because the driver's
    canonicalizer (like most table hashes) wants scalar cells; a real
    sink would keep array<int>.
    """
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    tok = t.select(
        "doc_id", F.posexplode("toks").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    counts = tok.groupBy("token").agg(F.count("*").alias("c"))
    from pyspark.sql import Window as W

    # TakeOrdered heap to the top-VOCAB_SIZE tokens first; the id-
    # assignment window then ranks the bounded VOCAB_SIZE-row result
    # (bounded_window), never the full token-type table.
    vocab = (
        counts.orderBy(F.col("c").desc(), "token")
        .limit(VOCAB_SIZE)
        .withColumn(
            "id",
            F.row_number().over(W.orderBy(F.col("c").desc(), "token")) - 1,
        )
        .select("token", "id")
    )
    enc = tok.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(-1)).alias("id")
    )
    ordered_ids = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "id"))),
        lambda x: x["id"].cast("string"),
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("id") == -1, 1).otherwise(0)).cast("bigint").alias("n_unk"),
        F.array_join(ordered_ids, ",").alias("ids_csv"),
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT token,
           COUNT(DISTINCT doc_id) AS doc_freq,
           CAST(COUNT(*) AS BIGINT) AS term_freq,
           array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',') AS first_postings
    FROM tok
    GROUP BY token
    """,
    tags=("text", "inverted_index", "postings", "search"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an inverted index over the corpus: token → document
    frequency, corpus term frequency, and the first 5 postings (sorted
    doc ids). The retrieval-side primitive behind BM25 / dedup-by-query
    — the reference's WordCount composite
    (/root/reference/beam_pyspark_runner/example_pipes.py) counts
    tokens but cannot produce postings because GroupByKey materializes
    the whole group in one worker's memory. Honest scale caveat:
    ``collect_set``'s partial-agg state holds the full per-token set,
    so a stop-word's posting list is executor-memory-bounded before the
    final slice — at 100 TB, cap postings per token with a windowed
    row_number (or drop head terms via a doc-freq prefilter) and write
    hot tokens' full lists as a bucketed sorted table; the fixture's
    tiny vocabulary doesn't need the rescue (slice kept to stay
    value-hashable)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("term_freq"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_set("doc_id")), 1, 5)
        ).alias("first_postings"),
    )


@register(
    "source_gini_diversity",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY 1, 2
    ),
    t AS (
        SELECT source, SUM(cnt) AS total, SUM(cnt * cnt) AS sq
        FROM c GROUP BY 1
    )
    SELECT source,
           CAST(total AS BIGINT) AS n_docs,
           CAST(total * total - sq AS DOUBLE) / CAST(total * total AS DOUBLE)
               AS lang_gini
    FROM t
    """,
    tags=("text", "diversity", "gini", "mixture"),
)
def source_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix diversity per source as Gini impurity
    1 - Σ pᵢ² — the mixture-balance signal a corpus curator reads before
    setting sampling quotas (cf. mixture_weights / source_quota_sample).
    Shannon entropy is the textbook choice but needs log(), and libm
    logs differ by ulps across engines (the tfidf_top_terms rationale);
    Gini is pure rational arithmetic — integer counts, one final
    division — so it value-hashes exactly.

    Two nested partial aggregates ((source,lang) then source), both
    map-side combinable; nothing but counts ever shuffles. The identity
    1 - Σpᵢ² = (T² - Σcᵢ²)/T² keeps every intermediate an integer."""
    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    c = docs.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    t = c.groupBy("source").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
    )
    tt = F.col("total") * F.col("total")
    return t.select(
        "source",
        F.col("total").cast("long").alias("n_docs"),
        ((tt - F.col("sq")).cast("double") / tt.cast("double")).alias("lang_gini"),
    )


@register(
    "token_lift_pairs",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    uni AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS total FROM tok),
    big AS (
        SELECT a.token AS w1, b.token AS w2, COUNT(*) AS c12
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
    )
    SELECT w1, w2, c12,
           CAST(n.total AS DOUBLE) * CAST(c12 AS DOUBLE)
               / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
    FROM big
    JOIN uni u1 ON u1.token = w1
    JOIN uni u2 ON u2.token = w2
    CROSS JOIN n
    WHERE c12 >= 5
    """,
    tags=("text", "collocation", "lift", "pmi_family"),
)
def token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: lift = P(w1,w2)/(P(w1)P(w2)) for adjacent
    token pairs with support ≥ 5 — PMI's argument without the log, so
    the score is pure rational arithmetic (counts and one multiply/
    divide chain) and value-hashes exactly where log-PMI would drift by
    ulps (the tfidf/bigram_lm rationale; rank order is identical since
    log is monotone).

    Plan: ONE corpus tokenize feeding both the unigram agg and the
    adjacent-pair agg (pairs via in-document shift inside a HOF — no
    positional self-join on the Spark side), then two broadcast joins of
    the vocab-sized unigram table and the 1-row total into the
    vocab²-bounded pair table. The corpus is scanned once; everything
    past the two partial aggs is dimension-sized. The unigram joins
    carry no broadcast hint: at fixture scale AQE broadcasts them, and
    a web-scale vocabulary falls back to a hash join on its own."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(F.split("text", " ").alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    total = toks.select(
        F.sum(F.size("ts")).cast("long").alias("total")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(ts, 1, size(ts) - 1), "
                "(x, i) -> struct(x AS w1, ts[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= 5)
    )
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c2"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "c12",
            (
                F.col("total").cast("double") * F.col("c12").cast("double")
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
            ).alias("lift"),
        )
    )


@register(
    "dataset_card_report",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_docs,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
               AS chars_per_token,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups
    FROM t
    """,
    tags=("text", "dataset_card", "corpus_report", "governance"),
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one row — the governance summary published
    next to a training corpus (Datasheets for Datasets, Gebru et al.
    2021): volume (docs/tokens), coverage (languages/sources),
    integrity (exact-dup count via content fingerprints), and a
    tokenizer sanity ratio. ONE scan, one global conditional aggregate;
    every statistic is a count or an integer ratio, so the card hashes
    exactly. At 100 TB the distinct-counts swap to the HLL/bitmap
    sketches in the same aggregate slots (approx_distinct shows the
    bounded-error contract) — the report shape doesn't change."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang", "source", "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))).alias("fp"),
    )
    return t.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("fp").alias("n_unique_docs"),
        (
            F.sum("n_chars").cast("double") / F.sum("n_tokens").cast("double")
        ).alias("chars_per_token"),
        (F.count("*") - F.countDistinct("fp")).alias("n_exact_dups"),
    )


@register(
    "feature_hashing_stats",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, token,
               (('0x' || substr(md5(token), 1, 8))::BIGINT) % 1024 AS bucket
        FROM tok
    ),
    loads AS (
        SELECT bucket,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT token) AS n_distinct_tokens
        FROM hashed GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS buckets_used,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_bucket_load,
           CAST(MAX(n_distinct_tokens) AS BIGINT) AS max_bucket_collisions
    FROM loads
    """,
    tags=("text", "feature_hashing", "hashing_trick", "ml_features"),
)
def feature_hashing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09): tokens map to a
    FIXED 1024-bucket feature space via the cross-engine md5 hash — the
    featurizer whose memory is constant no matter how the vocabulary
    grows, which is why it (not a learned vocab) survives 100 TB of
    unseen text. Reported: bucket occupancy, load, and the collision
    profile (max distinct tokens sharing a bucket) that tells you
    whether K needs raising. Shape: one tokenize → one bucket-keyed
    partial agg (the feature vector materialization would be the same
    agg keyed by (doc, bucket)) → a 1024-row summary. No vocabulary,
    no broadcast, no join anywhere."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashed = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).select("token", (h32(F.col("token")) % 1024).alias("bucket"))
    loads = hashed.groupBy("bucket").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
    )
    return loads.agg(
        F.count("*").alias("buckets_used"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("n_tokens").cast("long").alias("max_bucket_load"),
        F.max("n_distinct_tokens").cast("long").alias("max_bucket_collisions"),
    )


@register(
    "keyword_in_context",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    tok AS (
        SELECT doc_id, ts,
               unnest(ts) AS token,
               generate_subscripts(ts, 1) AS pos
        FROM t
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           COALESCE(array_to_string(ts[greatest(1, pos - 2):pos - 1], ' '), '')
               AS left_context,
           COALESCE(array_to_string(ts[pos + 1:pos + 2], ' '), '')
               AS right_context
    FROM tok WHERE token = 'data'
    """,
    tags=("text", "kwic", "concordance", "retrieval"),
)
def keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC concordance — every occurrence of a query term with ±2
    tokens of context, the classic corpus-linguistics view (and the
    snippet generator behind search results). The context windows
    come straight from the token array of the SAME row (posexplode
    keeps the array alongside the position), so there is no
    positional self-join — the inverted_index + slice composition in
    one pass, output bounded by term frequency, not corpus size."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    tok = docs.select(
        "doc_id", "ts", F.posexplode("ts").alias("pos0", "token")
    ).filter(F.col("token") == "data")
    pos = F.col("pos0") + 1  # 1-based
    start = F.greatest(F.lit(1), pos - 2)
    return tok.select(
        "doc_id",
        pos.cast("long").alias("pos"),
        F.concat_ws(
            " ", F.slice(F.col("ts"), start, pos - start)
        ).alias("left_context"),
        F.concat_ws(" ", F.slice(F.col("ts"), pos + 1, F.lit(2))).alias(
            "right_context"
        ),
    )


@register(
    "unicode_nfc_clean",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 0
                            THEN ' cafe' || chr(769) ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
           length(t) AS len_before,
           length(nfc_normalize(t)) AS len_after,
           nfc_normalize(t) <> t AS changed
    FROM raw
    """,
    tags=("text", "unicode", "nfc", "normalization", "pandas_udf"),
)
def unicode_nfc_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the canonicalization every dedup /
    tokenizer pipeline needs FIRST (a decomposed 'e'+U+0301 and a
    precomposed 'é' are different bytes, different hashes, different
    tokens, same text). Spark has no NFC builtin, so this is a
    sanctioned Arrow-batched Python kernel (`mapInPandas` +
    unicodedata — the exact boundary rule from ARCHITECTURE: Python
    only where the JVM genuinely can't); DuckDB's native
    nfc_normalize is the oracle, making this a CROSS-IMPLEMENTATION
    check of the normalizer itself. Combining marks are synthesized
    deterministically (every 7th doc) since the fixture is ASCII;
    per-doc before/after code-point counts and a changed flag come
    back for the downstream dedup join."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" cafe\u0301")).otherwise(
                F.lit("")
            ),
        ).alias("t"),
    )

    def kernel(batches):
        import unicodedata

        for pdf in batches:
            norm = pdf["t"].map(lambda x: unicodedata.normalize("NFC", x))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "len_before": pdf["t"].str.len().astype("int64"),
                    "len_after": norm.str.len().astype("int64"),
                    "changed": norm.ne(pdf["t"]),
                }
            )

    return docs.mapInPandas(
        kernel,
        "doc_id bigint, len_before bigint, len_after bigint, changed boolean",
    )


@register(
    "trending_terms_rankshift",
    oracle="""
    WITH tok AS (
        SELECT doc_id % 2 AS period,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    counts AS (
        SELECT token,
               COUNT(*) FILTER (WHERE period = 1) AS cur,
               COUNT(*) FILTER (WHERE period = 0) AS ref
        FROM tok GROUP BY token
    ),
    ranked AS (
        SELECT token, cur, ref,
               ROW_NUMBER() OVER (ORDER BY cur DESC, token) AS cur_rank,
               ROW_NUMBER() OVER (ORDER BY ref DESC, token) AS ref_rank
        FROM counts
    )
    SELECT token, cur AS current_count, ref AS reference_count,
           CAST(cur_rank AS BIGINT) AS cur_rank,
           CAST(ref_rank AS BIGINT) AS ref_rank,
           CAST(ref_rank - cur_rank AS BIGINT) AS rank_gain
    FROM ranked
    WHERE cur_rank <= 10 OR ref_rank <= 10
    """,
    tags=("text", "trending", "rank_shift", "monitoring"),
)
def trending_terms_rankshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending terms: token frequency ranks in the current period vs
    the reference period, with the rank gain that surfaces risers —
    the what's-changed view over a text stream (period = doc parity
    here; production uses time buckets). BOTH period counts come from
    one conditional aggregate over one tokenize. No global rank window
    anywhere: the output set is exactly (cur top-10 ∪ ref top-10), so
    each leg's candidates come from a TakeOrdered heap, and each
    candidate's EXACT global rank is a conditional count against the
    vocabulary table — rank(t) = 1 + |{u : c_u > c_t ∨ (c_u = c_t ∧
    u < t)}| — computed in one ≤20-way broadcast-crossJoin aggregate
    with map-side partial aggregation (vocab scanned once, never
    sorted). Ranks tie-break on the token so the shift is
    deterministic."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("period"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    counts = docs.groupBy("token").agg(
        F.count(F.when(F.col("period") == 1, 1)).alias("cur"),
        F.count(F.when(F.col("period") == 0, 1)).alias("ref"),
    )
    top_cur = counts.orderBy(F.col("cur").desc(), "token").limit(10)
    top_ref = counts.orderBy(F.col("ref").desc(), "token").limit(10)
    cands = (
        top_cur.unionByName(top_ref)
        .dropDuplicates(["token"])
        .select(
            F.col("token").alias("c_token"),
            F.col("cur").alias("c_cur"),
            F.col("ref").alias("c_ref"),
        )
    )

    def _better(count_col: str, cand_col: str):
        return (F.col(count_col) > F.col(cand_col)) | (
            (F.col(count_col) == F.col(cand_col))
            & (F.col("token") < F.col("c_token"))
        )

    ranked = (
        counts.crossJoin(F.broadcast(cands))
        .groupBy("c_token", "c_cur", "c_ref")
        .agg(
            (1 + F.sum(F.when(_better("cur", "c_cur"), 1).otherwise(0)))
            .cast("long")
            .alias("cur_rank"),
            (1 + F.sum(F.when(_better("ref", "c_ref"), 1).otherwise(0)))
            .cast("long")
            .alias("ref_rank"),
        )
    )
    return ranked.filter(
        (F.col("cur_rank") <= 10) | (F.col("ref_rank") <= 10)
    ).select(
        F.col("c_token").alias("token"),
        F.col("c_cur").alias("current_count"),
        F.col("c_ref").alias("reference_count"),
        "cur_rank",
        "ref_rank",
        (F.col("ref_rank") - F.col("cur_rank")).alias("rank_gain"),
    )


@register(
    "classifier_eval_f1",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                 CAST(len(list_filter(toks, x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS en_ratio
          FROM t),
    pred AS (
        SELECT lang = 'en' AS truth,
               (sw_ratio + en_ratio > 0.12) AS predicted
        FROM s
    ),
    cm AS (
        SELECT COUNT(*) FILTER (WHERE truth AND predicted) AS tp,
               COUNT(*) FILTER (WHERE NOT truth AND predicted) AS fp,
               COUNT(*) FILTER (WHERE truth AND NOT predicted) AS fn,
               COUNT(*) FILTER (WHERE NOT truth AND NOT predicted) AS tn
        FROM pred
    )
    SELECT tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision,
           CAST(tp AS DOUBLE) / (tp + fn) AS recall,
           CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1,
           CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
    FROM cm
    """,
    tags=("text", "ml_eval", "confusion_matrix", "f1"),
)
def classifier_eval_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation — confusion matrix, precision/recall/F1,
    accuracy — run against THIS REPO'S OWN lang-ID heuristic with the
    fixture's lang column as ground truth: the eval harness is itself
    a distributed query (one scan, one conditional aggregate over the
    prediction expression — the classifier never materializes a
    predictions table), and the result doubles as a measured quality
    statement about lang_id_heuristic rather than a toy. All four
    rates are count ratios (F1 via the 2tp identity — no intermediate
    precision/recall float reuse), so the report value-hashes."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    en = (
        F.size(F.filter(toks, lambda x: x.isin("data", "query", "table"))).cast(
            "double"
        )
        / n
    )
    pred = d.select(
        (F.col("lang") == "en").alias("truth"),
        ((sw + en) > 0.12).alias("predicted"),
    )
    cm = pred.agg(
        F.count(F.when(F.col("truth") & F.col("predicted"), 1)).alias("tp"),
        F.count(F.when(~F.col("truth") & F.col("predicted"), 1)).alias("fp"),
        F.count(F.when(F.col("truth") & ~F.col("predicted"), 1)).alias("fn"),
        F.count(F.when(~F.col("truth") & ~F.col("predicted"), 1)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp", "fp", "fn", "tn",
        (tp / (tp + fp)).alias("precision"),
        (tp / (tp + fn)).alias("recall"),
        ((2 * tp) / (2 * tp + fp + fn)).alias("f1"),
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
    )


@register(
    "boilerplate_line_removal",
    oracle="""
    WITH lines AS (
        SELECT doc_id,
               unnest(string_split(text, '. ')) AS line
        FROM documents
    ),
    freq AS (
        SELECT line, COUNT(DISTINCT doc_id) AS df
        FROM lines GROUP BY line
    ),
    n_docs AS (SELECT COUNT(*) AS nd FROM documents),
    flagged AS (
        SELECT l.doc_id, l.line,
               f.df * 10 > n.nd AS is_boilerplate
        FROM lines l
        JOIN freq f ON f.line = l.line
        CROSS JOIN n_docs n
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE is_boilerplate) AS n_boilerplate,
           CAST(SUM(CASE WHEN NOT is_boilerplate
                         THEN length(line) ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("text", "boilerplate", "line_dedup", "c4_cleaning"),
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-line removal — the CCNet/C4 cleaning step that strips
    navigation chrome, cookie banners, and license footers: a line
    (sentence here) appearing in more than 10% of documents is
    boilerplate BY CORPUS FREQUENCY, not by pattern — the insight that
    makes the filter language- and site-agnostic. Per doc: line count,
    boilerplate count, and surviving characters. Shape: one explode,
    one line-keyed document-frequency aggregate (hash-sized rows),
    one join back (AQE broadcasts the frequency table when the line
    vocabulary allows, hash-joins otherwise), one doc-keyed rollup —
    the same index-then-rejoin shape as incremental_dedup_delta, at
    line granularity. The 10% threshold is integer-compared
    (df·10 > N), no float."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lines = d.select(
        "doc_id", F.explode(F.split("text", r"\. ")).alias("line")
    )
    freq = lines.groupBy("line").agg(F.countDistinct("doc_id").alias("df"))
    nd = d.agg(F.count("*").alias("nd"))
    flagged = (
        lines.join(freq, "line")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "line",
            (F.col("df") * 10 > F.col("nd")).alias("is_boilerplate"),
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("is_boilerplate"), 1)).alias("n_boilerplate"),
        F.sum(
            F.when(~F.col("is_boilerplate"), F.length("line")).otherwise(0)
        ).cast("long").alias("kept_chars"),
    )


@register(
    "lm_fluency_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS t,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    big AS (
        SELECT a.doc_id, a.t AS w1, b.t AS w2
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    pair_counts AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2
    ),
    ctx_counts AS (
        SELECT w1, SUM(c12) AS c1 FROM pair_counts GROUP BY 1
    ),
    scored AS (
        SELECT g.doc_id,
               CAST(p.c12 AS DOUBLE) / CAST(x.c1 AS DOUBLE) AS prob
        FROM big g
        JOIN pair_counts p ON p.w1 = g.w1 AND p.w2 = g.w2
        JOIN ctx_counts x ON x.w1 = g.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(ROUND(SUM(CAST(prob AS DECIMAL(38,10))), 6) AS DOUBLE)
               / COUNT(*) AS avg_bigram_prob
    FROM scored
    GROUP BY doc_id
    """,
    tags=("text", "lm_scoring", "fluency", "data_selection"),
)
def lm_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based fluency scoring — the CCNet-style data-selection
    signal: every document scored by its average bigram probability
    under the corpus's own count LM (a fluent doc's transitions are
    common; gibberish scores low). Perplexity is the textbook form but
    its log/exp would break cross-engine hashing — the mean
    probability ranks documents the same direction with pure count
    ratios, decimal-summed per doc (the bigram_lm_probs log-avoidance,
    extended from building the LM to APPLYING it).

    Shape: one tokenize feeds the in-document shifted-pair stream; the
    LM is two vocab²-bounded aggregates; scoring joins each doc bigram
    to its probability (AQE broadcasts the LM when vocabulary allows)
    and folds per doc. The corpus streams twice (train + score) — at
    100 TB the trained LM table persists and scoring is the only
    repeated pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(ts, 1, size(ts) - 1), "
                "(x, i) -> struct(x AS w1, ts[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    pair_counts = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    probs = pair_counts.join(ctx_counts, "w1").select(
        "w1", "w2",
        (F.col("c12").cast("double") / F.col("c1").cast("double")).alias("prob"),
    )
    scored = big.join(probs, ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.sum(F.col("prob").cast("decimal(38,10)"))
            .cast("decimal(38,6)")
            .cast("double")
            / F.count("*")
        ).alias("avg_bigram_prob"),
    )


@register(
    "doc_length_pow2_histogram",
    oracle="""
    WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT length(bin(n_tokens)) AS pow2_bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM lens GROUP BY 1
    """,
    tags=("text", "histogram", "pow2_bins", "length_distribution"),
)
def doc_length_pow2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in POWER-OF-2 buckets — the log-scale
    view length distributions need (linear bins hide the tail), with
    the log computed as an INTEGER BIT LENGTH: bucket =
    len(binary(n)) = ⌊log₂ n⌋+1, exact in both engines where
    floor(log2(x)) on doubles can land on either side of a boundary by
    one ulp. The batch-shape question this answers — how many docs
    fall in each 2^k token band — drives packing and padding budgets
    (cf. pack_token_budget). One scan, one small aggregate."""
    d = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    return d.groupBy(
        F.length(F.bin(F.col("n_tokens"))).cast("long").alias("pow2_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "content_defined_chunking",
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS len FROM documents
        WHERE length(text) >= 8
    ),
    pos AS (
        SELECT doc_id, text, len,
               unnest(range(2, len - 6)) AS p
        FROM docs
    ),
    bounds AS (
        SELECT doc_id, p
        FROM pos
        WHERE (('0x' || substr(md5(substr(text, CAST(p AS INTEGER), 8)), 1, 8))::BIGINT)
              % 64 = 0
        UNION ALL
        SELECT doc_id, len + 1 FROM docs
    ),
    sized AS (
        SELECT doc_id, p,
               p - COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p), 1)
                   AS chunk_len
        FROM bounds
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(MAX(chunk_len) AS BIGINT) AS max_chunk,
           CAST(SUM(chunk_len) AS BIGINT) AS total_chars
    FROM sized GROUP BY doc_id
    """,
    tags=("text", "content_defined_chunking", "cdc_dedup", "rolling_hash"),
)
def content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/restic primitive):
    chunk boundaries fall where the hash of the local 8-char window
    hits 0 mod 64 — so an insertion early in a document shifts ONE
    chunk, not every fixed-size block after it, which is what makes
    dedup of near-identical large objects work at all. Expected chunk
    size = the modulus (64); per doc: chunk count, largest chunk, and
    a total that must re-add to the document length (conservation
    pinned by the hash match). Shape: one position explode bounded by
    text length, a hash-filter, one per-doc window for sizes — the
    fan-out is characters, the state per doc is its boundary list;
    the same plan chunks binary payloads at 100 TB (byte windows via
    the multimodal kernels when substrings must be binary-safe)."""
    from pyspark.sql import Window as W

    from beam_pyspark_runner_spark.functions.hashing import h32

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 8
    ).select("doc_id", "text", F.length("text").alias("len"))
    # len == 8 guard: sequence(2, len-7) = sequence(2, 1) would produce a
    # DESCENDING [2, 1] in Spark (start > stop defaults step to -1) while
    # the DuckDB oracle's range(2, len-6) is empty — emit an empty array
    # instead so both engines agree that an 8-char doc has no interior
    # boundary candidates (it still gets its final bound via the union).
    pos = docs.select(
        "doc_id", "text", "len",
        F.explode(
            F.when(
                F.col("len") >= 9, F.sequence(F.lit(2), F.col("len") - 7)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    )
    bounds = (
        pos.filter(
            F.pmod(
                h32(F.expr("substring(text, p, 8)")), F.lit(64)
            ) == 0
        ).select("doc_id", "p")
        .unionByName(docs.select("doc_id", (F.col("len") + 1).alias("p")))
    )
    w = W.partitionBy("doc_id").orderBy("p")
    sized = bounds.select(
        "doc_id",
        (F.col("p") - F.coalesce(F.lag("p").over(w), F.lit(1))).alias(
            "chunk_len"
        ),
    )
    return sized.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_len").cast("long").alias("max_chunk"),
        F.sum("chunk_len").cast("long").alias("total_chars"),
    )


@register(
    "cohens_kappa_agreement",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
               FROM documents),
    labels AS (
        SELECT doc_id,
               (CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                    / len(toks)
                + CAST(len(list_filter(toks,
                      x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                    / len(toks)) > 0.12 AS rater_a,
               n_chars >= 300 AS rater_b
        FROM t
    ),
    cm AS (
        SELECT COUNT(*) FILTER (WHERE rater_a AND rater_b) AS yy,
               COUNT(*) FILTER (WHERE rater_a AND NOT rater_b) AS yn,
               COUNT(*) FILTER (WHERE NOT rater_a AND rater_b) AS ny,
               COUNT(*) FILTER (WHERE NOT rater_a AND NOT rater_b) AS nn
        FROM labels
    )
    SELECT yy, yn, ny, nn,
           CAST(yy + nn AS DOUBLE) / (yy + yn + ny + nn) AS observed_agreement,
           (CAST((yy + yn) AS DOUBLE) * (yy + ny)
              + CAST((ny + nn) AS DOUBLE) * (yn + nn))
             / (CAST(yy + yn + ny + nn AS DOUBLE)
                * (yy + yn + ny + nn)) AS expected_agreement,
           (CAST(yy + nn AS DOUBLE) / (yy + yn + ny + nn)
              - (CAST((yy + yn) AS DOUBLE) * (yy + ny)
                   + CAST((ny + nn) AS DOUBLE) * (yn + nn))
                / (CAST(yy + yn + ny + nn AS DOUBLE) * (yy + yn + ny + nn)))
           / (1.0 - (CAST((yy + yn) AS DOUBLE) * (yy + ny)
                       + CAST((ny + nn) AS DOUBLE) * (yn + nn))
                    / (CAST(yy + yn + ny + nn AS DOUBLE)
                       * (yy + yn + ny + nn))) AS kappa
    FROM cm
    """,
    tags=("text", "cohens_kappa", "annotator_agreement", "label_qa"),
)
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two independent labelers — here two cheap doc
    heuristics (the stopword lang-ID rule vs a length rule) — the
    annotation-QA statistic that separates real agreement from the
    agreement two biased raters get for free (κ corrects observed
    agreement by the chance rate the marginals imply). Raw agreement
    without κ is how label pipelines fool themselves. One scan, one
    2×2 conditional aggregate; κ is count arithmetic on the four
    cells — exact. The same query shape scores a model against a
    human sample or two model versions against each other."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    en = (
        F.size(F.filter(toks, lambda x: x.isin("data", "query", "table"))).cast(
            "double"
        )
        / n
    )
    labels = d.select(
        ((sw + en) > 0.12).alias("rater_a"),
        (F.col("n_chars") >= 300).alias("rater_b"),
    )
    cm = labels.agg(
        F.count(F.when(F.col("rater_a") & F.col("rater_b"), 1)).alias("yy"),
        F.count(F.when(F.col("rater_a") & ~F.col("rater_b"), 1)).alias("yn"),
        F.count(F.when(~F.col("rater_a") & F.col("rater_b"), 1)).alias("ny"),
        F.count(F.when(~F.col("rater_a") & ~F.col("rater_b"), 1)).alias("nn"),
    )
    yy, yn, ny, nn = (F.col(c) for c in ("yy", "yn", "ny", "nn"))
    tot = (yy + yn + ny + nn).cast("double")
    po = (yy + nn).cast("double") / tot
    pe = (
        (yy + yn).cast("double") * (yy + ny).cast("double")
        + (ny + nn).cast("double") * (yn + nn).cast("double")
    ) / (tot * tot)
    return cm.select(
        "yy", "yn", "ny", "nn",
        po.alias("observed_agreement"),
        pe.alias("expected_agreement"),
        ((po - pe) / (1.0 - pe)).alias("kappa"),
    )


@register(
    "vocab_coverage_curve",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks
    ),
    counts AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, bigram) AS rnk
        FROM counts
    ),
    stats AS (
        SELECT CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c) FILTER (WHERE rnk <= 50) AS BIGINT) AS cov50,
               CAST(SUM(c) FILTER (WHERE rnk <= 200) AS BIGINT) AS cov200,
               CAST(SUM(c) FILTER (WHERE rnk <= 500) AS BIGINT) AS cov500
        FROM ranked
    )
    SELECT vocab_size, n_types, covered, total,
           CAST(covered AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
    FROM (
        SELECT CAST(50 AS BIGINT) AS vocab_size, n_types, cov50 AS covered,
               total FROM stats
        UNION ALL
        SELECT 200, n_types, cov200, total FROM stats
        UNION ALL
        SELECT 500, n_types, cov500, total FROM stats
    )
    """,
    tags=("bounded_window", "text_analysis", "tokenizer", "vocab", "coverage"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus coverage as a function of vocabulary size — for each
    candidate vocab budget k, the fraction of all token-bigram
    occurrences covered by the k most frequent bigram types. THE
    tokenizer-design curve: where it flattens is where a bigger vocab
    stops paying for itself (the same marginal-coverage argument
    SentencePiece/BPE vocab-size ablations make). Units here are
    adjacent word bigrams (the fixture's word vocabulary is too small
    to have a tail; bigram types give the curve a body and match
    `bpe_pair_counts`' merge-candidate universe one level up).

    Scale: the corpus-sized work is one explode + one bigram-keyed
    partial agg; the ranking window and the conditional coverage sums
    run on the TYPE table (≤ vocab² rows), never the corpus. All three
    budget points come from one conditional aggregate — no per-k
    rescans. Coverage is a single bigint/bigint divide."""
    t = load_table(spark, sf_dir, "documents").select(
        _tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    bg = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram")
    )
    counts = bg.groupBy("bigram").agg(F.count("*").alias("c"))
    from pyspark.sql import Window as W

    # Corpus totals need no ordering; only the top-500 cut needs ranks.
    # TakeOrdered heap to the 500 heaviest types, rank within that
    # bounded frame (bounded_window), then one broadcast of the totals
    # row — the full type table is never globally sorted.
    totals = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").alias("n_types"),
    )
    top = counts.orderBy(F.col("c").desc(), "bigram").limit(500)
    ranked = top.select(
        "c",
        F.row_number().over(W.orderBy(F.col("c").desc(), "bigram")).alias("rnk"),
    ).crossJoin(F.broadcast(totals))
    stats = ranked.agg(
        F.max("total").cast("long").alias("total"),
        F.max("n_types").alias("n_types"),
        *[
            F.sum(F.when(F.col("rnk") <= k, F.col("c")))
            .cast("long")
            .alias(f"cov{k}")
            for k in (50, 200, 500)
        ],
    )
    legs = [
        stats.select(
            F.lit(k).cast("long").alias("vocab_size"),
            "n_types",
            F.col(f"cov{k}").alias("covered"),
            "total",
        )
        for k in (50, 200, 500)
    ]
    out = legs[0].unionAll(legs[1]).unionAll(legs[2])
    return out.withColumn(
        "coverage",
        F.col("covered").cast("double") / F.col("total").cast("double"),
    )


# --- corpus novelty (Rae et al. 2021 "Gopher" §A.4 novelty metric) ---------


@register(
    "ngram_novelty_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks
    ),
    first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
    novel AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel FROM first GROUP BY 1),
    totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY 1)
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
               / CAST(t.n_grams AS DOUBLE) AS novelty_rate
    FROM totals t LEFT JOIN novel n USING (doc_id)
    """,
    tags=("text", "ngram", "novelty", "dedup_adjacent", "corpus_quality"),
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY rate (the Gopher/MassiveText metric,
    Rae et al. 2021): the fraction of a document's distinct word
    3-grams whose globally FIRST occurrence (min doc_id over the whole
    corpus) is this document. Corpora with sagging novelty curves are
    dominated by templated/duplicated text that exact and near dedup
    both miss — this is the diagnostic that says whether more dedup
    budget is warranted, and in arrival order it doubles as the
    "how much of today's crawl is new" monitor.

    Scale shape: the wordcount discipline — one gram-keyed shuffle to
    find each gram's first doc (partial-agg min, so the explode never
    shuffles raw fan-out), two doc-keyed counts, one doc-cardinality
    join. No pairwise anything: cost is O(corpus grams) map-side at
    100 TB. Shares the shingle lineage with the dedup family
    (queries/dedup.py _shingle_df)."""
    from beam_pyspark_runner_spark.queries.dedup import _shingle_df

    sh = _shingle_df(spark, sf_dir)
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    totals = sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return totals.join(novel, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        (
            F.coalesce("n_novel", F.lit(0)).cast("double")
            / F.col("n_grams").cast("double")
        ).alias("novelty_rate"),
    )


# --- DSIR-style hashed-feature importance weights (Xie et al. 2023) --------
DSIR_BUCKETS = 64
_DSIR_SCALE = 1 << 20  # log2-quantization resolution for the ratio


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, lang,
               ({h32_sql('w')}) % {DSIR_BUCKETS} AS b
        FROM tok
    ),
    dist AS (
        SELECT b,
               COUNT(*) AS n_raw,
               COUNT(*) FILTER (WHERE lang = 'en') AS n_tgt
        FROM bucketed GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(n_raw) AS BIGINT) AS r, CAST(SUM(n_tgt) AS BIGINT) AS t
        FROM dist
    ),
    q AS (
        SELECT b,
               CAST(length(bin(CAST(FLOOR(
                   ((CAST(n_tgt AS DOUBLE) + 1) / (CAST(t AS DOUBLE) + {DSIR_BUCKETS}))
                   / ((CAST(n_raw AS DOUBLE) + 1) / (CAST(r AS DOUBLE) + {DSIR_BUCKETS}))
                   * {_DSIR_SCALE}.0) AS BIGINT))) AS BIGINT) - 21 AS qlog
        FROM dist, tot
    ),
    per_doc AS (
        SELECT doc_id, b, COUNT(*) AS c FROM bucketed GROUP BY doc_id, b
    )
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           CAST(SUM(d.c * q.qlog) AS BIGINT) AS importance_q
    FROM per_doc d JOIN q USING (b)
    GROUP BY d.doc_id
    """,
    tags=("text", "importance_sampling", "dsir", "hashed_features",
          "data_selection"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-token features are
    under a TARGET distribution (here the lang='en' slice standing in
    for the curated target) than under the RAW corpus —
    log w(doc) = Σ_features log(p_target[b] / p_raw[b]).
    The log is computed as an INTEGER BIT LENGTH of the
    2^20-scaled ratio (the doc_length_pow2_histogram idiom), i.e.
    log2 quantized to ±1 — because IEEE ln() differs by ulps across
    engines, while division, floor and bin() do not; resampling only
    needs the relative ORDER of weights, which a monotone quantized
    log preserves up to quantization ties. Output is therefore pure
    integers and value-hashes exactly.

    Scale shape: the feature distributions are {DSIR_BUCKETS} rows
    built in ONE corpus pass (two conditional partial-agg counts);
    per-doc scoring is one (doc, bucket) partial agg joined to the
    broadcast 64-row quantized-ratio table. Nothing pairwise, nothing
    Python; at 100 TB this is two wordcount-shaped passes."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    bucketed = tok.select(
        "doc_id", "lang", F.pmod(h32(F.col("w")), F.lit(DSIR_BUCKETS)).alias("b")
    )
    dist = bucketed.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_tgt"),
    )
    tot = dist.agg(
        F.sum("n_raw").cast("long").alias("r"),
        F.sum("n_tgt").cast("long").alias("t"),
    )
    ratio = (
        (F.col("n_tgt").cast("double") + 1)
        / (F.col("t").cast("double") + DSIR_BUCKETS)
    ) / (
        (F.col("n_raw").cast("double") + 1)
        / (F.col("r").cast("double") + DSIR_BUCKETS)
    )
    q = dist.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.length(
                F.bin(F.floor(ratio * float(_DSIR_SCALE)).cast("bigint"))
            ).cast("long")
            - 21
        ).alias("qlog"),
    )
    per_doc = bucketed.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    return (
        per_doc.join(F.broadcast(q), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("qlog")).cast("long").alias("importance_q"),
        )
    )


@register(
    "tokenizer_fertility",
    oracle="""
    WITH t AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_ws,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS n_sub,
               length(replace(text, ' ', '')) AS n_text_chars
        FROM documents
    )
    SELECT lang,
           CAST(SUM(n_ws) AS BIGINT) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_subtokens,
           CAST(SUM(n_sub) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE) AS fertility,
           CAST(SUM(n_text_chars) AS DOUBLE) / CAST(SUM(n_sub) AS DOUBLE)
               AS chars_per_subtoken
    FROM t GROUP BY lang
    """,
    tags=("text", "tokenizer", "fertility", "per_language", "budgeting"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language: subword tokens emitted per
    whitespace word (here the regex tokenizer standing in for BPE) and
    characters consumed per subword token. Fertility is the standard
    multilingual-tokenizer efficiency metric (cf. the XLM-R and BLOOM
    tokenizer analyses): a language with fertility 2× pays twice the
    sequence length — and twice the training compute — for the same
    text, so per-language token budgets and sampling temperatures are
    set from exactly this table. Narrow map + one tiny per-lang
    aggregate; ratios are single IEEE divisions of exact integer sums
    (hash-stable)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("n_ws"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("n_sub"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_text_chars"
        ),
    )
    return t.groupBy("lang").agg(
        F.sum("n_ws").cast("long").alias("n_words"),
        F.sum("n_sub").cast("long").alias("n_subtokens"),
        (F.sum("n_sub").cast("double") / F.sum("n_ws").cast("double")).alias(
            "fertility"
        ),
        (
            F.sum("n_text_chars").cast("double") / F.sum("n_sub").cast("double")
        ).alias("chars_per_subtoken"),
    )


@register(
    "simpson_diversity_per_source",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    wc AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
    agg AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS DOUBLE) AS s2
        FROM wc GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           s2 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
               AS simpson,
           (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) / s2
               AS effective_vocab
    FROM agg
    """,
    tags=("text", "diversity", "simpson_index", "per_source",
          "corpus_quality"),
)
def simpson_diversity_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical DIVERSITY per source via the Simpson index Σp² and its
    inverse (the "effective vocabulary size" — how many equally-likely
    token types would produce the same repeat probability). Boilerplate
    -heavy sources collapse to a tiny effective vocabulary long before
    their raw type count shows it, so this is the per-source signal
    mixture builders threshold on. Deliberately NOT Shannon entropy:
    Σp² = Σc²/N² needs only integer sums and IEEE division (value-
    hashes exactly), where ln() differs by ulps across engines —
    and the two indices induce the same diversity ordering for the
    screening use-case. c² is accumulated in DECIMAL (HUGEINT on the
    oracle side): at 100 TB a source's top token count squared
    overflows a bigint; the conversion to double is one correctly-
    rounded step in both engines. Shape: wordcount shuffle on
    (source, token), then a per-source partial agg — two passes, no
    Python."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    wc = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    c_dec = F.col("c").cast("decimal(19,0)")
    agg = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(c_dec * c_dec).cast("double").alias("s2"),
    )
    n_d = F.col("n_tokens").cast("double")
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        (F.col("s2") / (n_d * n_d)).alias("simpson"),
        ((n_d * n_d) / F.col("s2")).alias("effective_vocab"),
    )


@register(
    "zipf_slope_fit",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    wc AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w),
    ranked AS (
        SELECT lang,
               CAST(length(bin(ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY c DESC, w))) AS BIGINT) AS x,
               CAST(length(bin(c)) AS BIGINT) AS y
        FROM wc
    ),
    s AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM ranked GROUP BY lang
    )
    SELECT lang, n_types,
           CASE WHEN n_types * sxx - sx * sx > 0
                THEN CAST(n_types * sxy - sx * sy AS DOUBLE)
                     / CAST(n_types * sxx - sx * sx AS DOUBLE)
           END AS zipf_slope
    FROM s
    """,
    tags=("text", "zipf", "rank_frequency", "ols", "per_language",
          "corpus_quality"),
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per language: OLS of log2(freq) on
    log2(rank) over the token frequency table. Natural text sits near
    slope −1 (Zipf's law); machine-generated or template text bends the
    curve, so the fitted slope is a corpus-naturalness check next to
    lm_fluency_score. Both logs are INTEGER BIT LENGTHS
    (len(bin(x)) = ⌊log2 x⌋+1 — the doc_length_pow2_histogram idiom):
    the OLS sums are then exact integers and the slope is one division,
    so the result value-hashes across engines where float log2 cannot.
    Shape: wordcount shuffle on (lang, token); the rank window runs
    per-language over the VOCABULARY table (≈1e5 rows at any corpus
    size — counts carry the corpus weight), the same bounded-window
    argument as bpe_pair_counts; then a per-lang 5-sum partial agg.
    Degenerate vocabularies where every x is equal (denominator 0)
    return NULL by contract."""
    from pyspark.sql import Window as W

    tok = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    wc = tok.groupBy("lang", "w").agg(F.count("*").alias("c"))
    win = W.partitionBy("lang").orderBy(F.col("c").desc(), F.col("w"))
    ranked = wc.select(
        "lang",
        F.length(F.bin(F.row_number().over(win))).cast("long").alias("x"),
        F.length(F.bin(F.col("c"))).cast("long").alias("y"),
    )
    s = ranked.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "lang",
        "n_types",
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "zipf_slope"
        ),
    )


@register(
    "bpe_merge_apply",
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w FROM documents
    ),
    wc AS (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS spaced,
             COUNT(*) AS freq
      FROM words WHERE length(w) >= 2 GROUP BY 1
    ),
    pairs1 AS (
      SELECT t[i] || ' ' || t[i+1] AS pair, freq
      FROM (SELECT string_split(spaced, ' ') AS t, freq FROM wc),
           (SELECT 1) dummy, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    top1 AS (
      SELECT pair FROM (SELECT pair, SUM(freq) AS total FROM pairs1 GROUP BY 1)
      ORDER BY total DESC, pair LIMIT 1
    ),
    merged AS (
      SELECT replace(wc.spaced, top1.pair, replace(top1.pair, ' ', '')) AS spaced,
             wc.freq
      FROM wc, top1
    ),
    pairs2 AS (
      SELECT t[i] || '+' || t[i+1] AS pair, freq
      FROM (SELECT string_split(spaced, ' ') AS t, freq FROM merged
            WHERE len(string_split(spaced, ' ')) >= 2),
           (SELECT 1) dummy, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    )
    SELECT pair, total, rnk FROM (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS total,
             ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, pair) AS rnk
      FROM pairs2 GROUP BY pair
    ) WHERE rnk <= 10
    """,
    tags=("bounded_window", "text", "tokenizer", "bpe", "iterative", "vocab"),
)
def bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND BPE training iteration (Sennrich et al. 2016):
    bpe_pair_counts finds the best merge; this query APPLIES it — every
    word (as a space-separated symbol sequence) has the winning
    adjacent pair fused into one multi-character symbol, then adjacent
    pairs are re-counted over the merged sequences and the next merge
    candidates ranked. This is the loop body of tokenizer training
    expressed relationally: the winning pair is a 1-row subquery
    broadcast onto the vocabulary, the merge itself is a string
    replace (left-to-right non-overlapping in both engines — exactly
    BPE's greedy application order), and re-counting is the same
    vocab-sized HOF expansion as iteration 1. Further iterations
    would repeat only these vocab-sized stages; the corpus is touched
    once, in the initial word count — the property that makes BPE
    training tractable at 100 TB. Output pairs use '+' as the symbol
    separator so multi-char symbols stay unambiguous."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)
        ).alias("w")
    ).filter(F.length("w") >= 2)
    wc = words.groupBy(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("spaced")
    ).agg(F.count("*").alias("freq"))

    def adjacent_pairs(df, sep):
        return df.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(spaced, ' ')) - 1), "
                    f"i -> concat(element_at(split(spaced, ' '), i), '{sep}', "
                    "element_at(split(spaced, ' '), i + 1)))"
                )
            ).alias("pair"),
        )

    from pyspark.sql import Window as W

    # argmax via TakeOrdered (orderBy+limit(1)), not a global rank
    # window over the pair-type table.
    top1 = (
        adjacent_pairs(wc, " ")
        .groupBy("pair")
        .agg(F.sum("freq").alias("total"))
        .orderBy(F.col("total").desc(), F.col("pair"))
        .limit(1)
        .select(F.col("pair").alias("best_pair"))
    )
    merged = wc.crossJoin(F.broadcast(top1)).select(
        F.replace(
            F.col("spaced"),
            F.col("best_pair"),
            F.replace(F.col("best_pair"), F.lit(" "), F.lit("")),
        ).alias("spaced"),
        "freq",
    ).filter(F.size(F.split("spaced", " ")) >= 2)
    totals = adjacent_pairs(merged, "+").groupBy("pair").agg(
        F.sum("freq").alias("total")
    )
    # TakeOrdered heap for the top-10; the rank window then runs over
    # the bounded 10-row heap result only (bounded_window).
    w2 = W.orderBy(F.col("total").desc(), F.col("pair"))
    top10 = totals.orderBy(F.col("total").desc(), F.col("pair")).limit(10)
    return (
        top10.withColumn("rnk", F.row_number().over(w2))
        .select(
            "pair",
            F.col("total").cast("long").alias("total"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "temperature_sampling_weights",
    oracle="""
    WITH per_lang AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs, n_tokens,
               CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isq
        FROM per_lang
    ),
    tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS s, CAST(SUM(n_tokens) AS BIGINT) AS nt
            FROM w)
    SELECT lang, n_docs, n_tokens,
           CAST(isq AS DOUBLE) / CAST(tot.s AS DOUBLE) AS sample_weight,
           (CAST(isq AS DOUBLE) / CAST(tot.s AS DOUBLE))
               / (CAST(n_tokens AS DOUBLE) / CAST(tot.nt AS DOUBLE))
               AS upsample_factor
    FROM w, tot
    """,
    tags=("text", "mixture", "temperature_sampling", "per_language",
          "data_selection"),
)
def temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language sampling weights (the multilingual-LM
    mixture rule, mBERT/XLM-R/mT5 lineage): sampling probability
    q_l ∝ p_l^α with α = 0.5, which upsamples low-resource languages
    relative to their natural share without flattening the mixture.
    α = 0.5 is computed as an INTEGER SQUARE ROOT — IEEE sqrt is
    correctly rounded (identical in both engines), and flooring it to
    a BIGINT makes the normalizing sum order-independent and exact,
    where a sum of raw sqrt doubles would be partial-order-dependent
    and hash-fragile; at corpus scale floor(√n_tokens) loses under
    1/√n relative precision — noise next to the α choice itself.
    Emits each language's weight and its upsample factor vs natural
    share (the number that says "Swahili is seen 4× its raw rate").
    One scan, one per-lang agg, one broadcast scalar — the mixture
    table mixture_weights consumes upstream."""
    per_lang = load_table(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    w = per_lang.withColumn(
        "isq", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    tot = w.agg(
        F.sum("isq").cast("long").alias("s"),
        F.sum("n_tokens").cast("long").alias("nt"),
    )
    sw = F.col("isq").cast("double") / F.col("s").cast("double")
    natural = F.col("n_tokens").cast("double") / F.col("nt").cast("double")
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        sw.alias("sample_weight"),
        (sw / natural).alias("upsample_factor"),
    )


CLF_BUCKETS = 64  # hashed feature space for the linear classifier
CLF_THRESHOLD_MILLI = 0  # keep docs with score > 0


@register(
    "linear_classifier_inference",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, ({h32_sql('w')}) % {CLF_BUCKETS} AS b, COUNT(*) AS c
        FROM tok GROUP BY doc_id, b
    ),
    weights AS (
        SELECT b,
               (('0x' || substr(md5('w-' || b), 1, 8))::BIGINT) % 2001 - 1000
                   AS w_milli
        FROM (SELECT unnest(range(0, {CLF_BUCKETS})) AS b)
    )
    SELECT f.doc_id,
           CAST(SUM(f.c) AS BIGINT) AS n_tokens,
           CAST(SUM(f.c * w.w_milli) AS BIGINT) AS score_milli,
           CAST(SUM(f.c * w.w_milli) AS DOUBLE)
               / (1000.0 * CAST(SUM(f.c) AS DOUBLE)) AS mean_score,
           SUM(f.c * w.w_milli) > {CLF_THRESHOLD_MILLI} AS keep
    FROM feats f JOIN weights w USING (b)
    GROUP BY f.doc_id
    """,
    tags=("text", "classifier_inference", "hashed_features", "quality_filter",
          "model_scoring"),
)
def linear_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-classifier INFERENCE at corpus scale — the fastText/CCNet
    quality-classifier serving shape: a trained model is just a weight
    vector over hashed token features, so scoring a 100 TB corpus is
    one wordcount-shaped pass with the {CLF_BUCKETS}-row weight table
    BROADCAST into the per-(doc, bucket) aggregate. No model server,
    no Python in the loop, no per-row UDF — model inference as a join.
    Weights here are synthesized deterministically in integer
    MILLI-units (hash of the bucket id), and the dot product is pure
    integer arithmetic until one final division — so scores value-hash
    exactly, the property a real deployment gets by fixed-point-
    quantizing its classifier (standard for reproducible data
    filtering). Emits per-doc token count, raw integer score, mean
    per-token score, and the keep decision at threshold
    {CLF_THRESHOLD_MILLI}. Feature extraction is shared verbatim with
    dsir_importance_weights — one hashed-feature lineage serves both
    selection and classification."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("w"),
    )
    feats = tok.groupBy(
        "doc_id", F.pmod(h32(F.col("w")), F.lit(CLF_BUCKETS)).alias("b")
    ).agg(F.count("*").alias("c"))
    weights = spark.range(CLF_BUCKETS).select(
        F.col("id").alias("b"),
        (
            F.pmod(
                h32(F.concat_ws("-", F.lit("w"), F.col("id"))), F.lit(2001)
            )
            - 1000
        ).alias("w_milli"),
    )
    return (
        feats.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("w_milli")).cast("long").alias(
                "score_milli"
            ),
            (
                F.sum(F.col("c") * F.col("w_milli")).cast("double")
                / (F.lit(1000.0) * F.sum("c").cast("double"))
            ).alias("mean_score"),
            (
                F.sum(F.col("c") * F.col("w_milli")) > CLF_THRESHOLD_MILLI
            ).alias("keep"),
        )
    )


# --- BM25 retrieval (round 7) ---
# Fixed keyword query: terms known to exist in the synthetic vocab.
BM25_QUERY = ("table", "hash", "merge")
BM25_TOPK = 20
# k1 = 6/5, b = 3/4 (the Robertson defaults as exact rationals).
# Per-term saturation tf·(k1+1)/(tf + k1·(1−b) + k1·b·dl/avgdl) with
# avgdl = A/N (A = corpus tokens, N = docs) multiplies through by 10·A
# into the integer ratio 22·A·tf / (10·A·tf + 3·A + 9·dl·N); idf uses
# the log-free rank-equivalent rational (2N − 2df + 1)/(2df + 1) —
# libm log() differs by ulps across engines (the repo-wide
# sqrt-yes/log-no line), a ratio of integers does not.


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    corpus AS (SELECT SUM(dl) AS a, COUNT(*) AS n FROM dl),
    qtf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok
        WHERE token IN {BM25_QUERY!r} GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY token),
    term_scores AS (
        SELECT q.doc_id, q.token,
               CAST(22 * c.a * q.tf * (2 * c.n - 2 * f.df + 1) AS DOUBLE)
               / CAST((10 * c.a * q.tf + 3 * c.a + 9 * d.dl * c.n)
                      * (2 * f.df + 1) AS DOUBLE) AS s
        FROM qtf q
        JOIN dfreq f ON f.token = q.token
        JOIN dl d ON d.doc_id = q.doc_id
        CROSS JOIN corpus c
    ),
    per_doc AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN token = '{BM25_QUERY[0]}' THEN s END), 0.0)
               + COALESCE(MAX(CASE WHEN token = '{BM25_QUERY[1]}' THEN s END), 0.0)
               + COALESCE(MAX(CASE WHEN token = '{BM25_QUERY[2]}' THEN s END), 0.0)
                   AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM term_scores GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank,
           doc_id, score, n_terms_hit
    FROM per_doc
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
    tags=("bounded_window", "text", "search", "bm25", "retrieval", "top_k"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{BM25_TOPK} retrieval for a fixed keyword query —
    the ranking function behind every large-scale lexical search /
    dedup-by-query pass (Robertson & Zaragoza 2009), composed from the
    same primitives as inverted_index_postings. All scoring inputs are
    INTEGER sufficient statistics (tf, df, dl, corpus totals), combined
    as one exact integer ratio per (doc, term) — k1=6/5, b=3/4
    multiplied through, idf as the log-free rank-equivalent rational —
    and the per-doc score sums its ≤|query| term ratios in ONE FIXED
    literal order, so the double result is bit-identical across
    engines. Scale shape: corpus tokenized once; the tf table is
    filtered to query terms BEFORE any shuffle (a 3-term query keeps
    ~3/|vocab| of tokens); df and the 1-row corpus totals ride
    broadcasts; the only wide ops are two keyed partial aggs and the
    global top-{BM25_TOPK} (TakeOrdered — never a full sort). Numerators
    stay < 2⁶³ through ~10¹² corpus tokens; past that, swap the longs
    for decimal(38,0) — same plan. The dl join shuffles on doc_id;
    at 100 TB pre-bucket the token table by doc_id so tf, dl, and the
    join co-locate with zero exchanges."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("long").alias("a"), F.count("*").alias("n")
    )
    qtf = (
        tok.filter(F.col("token").isin(*BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = qtf.groupBy("token").agg(F.count("*").alias("df"))
    s = (
        (
            22 * F.col("a") * F.col("tf")
            * (2 * F.col("n") - 2 * F.col("df") + 1)
        ).cast("double")
        / (
            (10 * F.col("a") * F.col("tf") + 3 * F.col("a")
             + 9 * F.col("dl") * F.col("n"))
            * (2 * F.col("df") + 1)
        ).cast("double")
    )
    # dfreq is vocabulary-grain (grows with the corpus under Heaps'
    # law) — no broadcast hint (round-10); the planner's size gate
    # broadcasts it while small and shuffles beyond.
    term_scores = (
        qtf.join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "token", s.alias("s"))
    )
    def _term(t):
        return F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        )

    per_doc = term_scores.groupBy("doc_id").agg(
        (
            _term(BM25_QUERY[0]) + _term(BM25_QUERY[1]) + _term(BM25_QUERY[2])
        ).alias("score"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )
    from pyspark.sql import Window as W

    top = per_doc.orderBy(F.desc("score"), "doc_id").limit(BM25_TOPK)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("score"), "doc_id"))
        .cast("long")
        .alias("rank"),
        "doc_id", "score", "n_terms_hit",
    )


# --- Gopher quality-rule audit (round 7) ---
# Word-level adaptation of the Rae et al. 2021 (Gopher §A1.1) document
# filters, sized to the fixture corpus (docs ~30 words): word-count
# bounds, mean-word-length bounds, top-token fraction, duplicate-
# trigram fraction, type-token ratio. All thresholds are tested by
# integer cross-multiplication — no float ratio ever materializes.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 1000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 4, 8  # mean word length bounds
GOPHER_TOP_TOK_PCT = 20  # top token may not exceed 20% of tokens
GOPHER_DUP_TRI_PCT = 0  # ANY duplicated trigram fails the rule
GOPHER_TTR_PCT = 30  # distinct/total tokens must be >= 30%


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH d AS (
        SELECT source, string_split(text, ' ') AS l FROM documents
    ),
    m AS (
        SELECT source,
               len(l) AS n,
               list_sum(list_transform(l, x -> length(x))) AS sum_len,
               len(list_distinct(l)) AS n_distinct,
               list_max(list_transform(list_distinct(l),
                        t -> len(list_filter(l, x -> x = t)))) AS top_tok,
               len(list_transform(range(1, len(l) - 1),
                   i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS n_tri,
               len(list_distinct(list_transform(range(1, len(l) - 1),
                   i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS d_tri
        FROM d
    ),
    r AS (
        SELECT source,
               (n < {GOPHER_MIN_WORDS} OR n > {GOPHER_MAX_WORDS}) AS f_len,
               (sum_len < {GOPHER_MIN_MWL} * n
                OR sum_len > {GOPHER_MAX_MWL} * n) AS f_mwl,
               (100 * top_tok > {GOPHER_TOP_TOK_PCT} * n) AS f_top,
               (n_tri > 0 AND 100 * (n_tri - d_tri)
                    > {GOPHER_DUP_TRI_PCT} * n_tri) AS f_tri,
               (100 * n_distinct < {GOPHER_TTR_PCT} * n) AS f_ttr
        FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
           CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(CASE WHEN f_top THEN 1 ELSE 0 END) AS BIGINT) AS fail_top_token,
           CAST(SUM(CASE WHEN f_tri THEN 1 ELSE 0 END) AS BIGINT) AS fail_dup_trigram,
           CAST(SUM(CASE WHEN f_ttr THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr,
           CAST(SUM(CASE WHEN NOT (f_len OR f_mwl OR f_top OR f_tri OR f_ttr)
                    THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
    FROM r GROUP BY source
    """,
    tags=("text_analysis", "quality_score", "gopher_rules", "audit",
          "higher_order_fns"),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality AUDIT: which rule rejects how many documents,
    per source — the report a curator reads before tuning thresholds
    (quality_filter / repetition_filter are the per-doc FILTERS; this is
    the corpus-level accounting that says WHY docs die). Five rules —
    word-count bounds, mean-word-length bounds, top-token fraction,
    duplicate-trigram fraction, type-token ratio — each tested by
    integer cross-multiplication (100·x > pct·n), so no float ratio
    exists to drift between engines. Scale shape: every per-doc
    statistic (including the trigram multiset) is computed INSIDE the
    row with array higher-order functions — tokenize once per doc in
    codegen, O(distinct×tokens) worst case like repetition_filter, no
    explode — so the corpus scan is narrow and the only shuffle is the
    |sources|-group final agg. The trigram builder guards n<3 (Spark's
    sequence(1, n-2) turns DESCENDING for n<3 — the CDC r5 bug class —
    DuckDB's range(1, n-1) is just empty)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("l")
    )
    n = F.size("l")
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("l", i),
                F.element_at("l", i + 1),
                F.element_at("l", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    m = d.select(
        "source",
        n.alias("n"),
        F.aggregate(
            F.transform("l", lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(F.array_distinct("l")).alias("n_distinct"),
        F.array_max(
            F.transform(
                F.array_distinct("l"),
                lambda t: F.size(F.filter("l", lambda x: x == t)),
            )
        ).alias("top_tok"),
        F.size(tri).alias("n_tri"),
        F.size(F.array_distinct(tri)).alias("d_tri"),
    )
    f_len = (F.col("n") < GOPHER_MIN_WORDS) | (F.col("n") > GOPHER_MAX_WORDS)
    f_mwl = (F.col("sum_len") < GOPHER_MIN_MWL * F.col("n")) | (
        F.col("sum_len") > GOPHER_MAX_MWL * F.col("n")
    )
    f_top = 100 * F.col("top_tok") > GOPHER_TOP_TOK_PCT * F.col("n")
    f_tri = (F.col("n_tri") > 0) & (
        100 * (F.col("n_tri") - F.col("d_tri"))
        > GOPHER_DUP_TRI_PCT * F.col("n_tri")
    )
    f_ttr = 100 * F.col("n_distinct") < GOPHER_TTR_PCT * F.col("n")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return m.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt(f_len).alias("fail_word_count"),
        cnt(f_mwl).alias("fail_mean_word_len"),
        cnt(f_top).alias("fail_top_token"),
        cnt(f_tri).alias("fail_dup_trigram"),
        cnt(f_ttr).alias("fail_ttr"),
        cnt(~(f_len | f_mwl | f_top | f_tri | f_ttr)).alias("pass_all"),
    )


# --- shard manifest packing (round 7) ---
SHARD_BUDGET_BYTES = 1000  # target shard size (sized to the fixture)
SHARD_BUCKET = 64  # doc_id-range bucket width for the two-phase prefix sum


@register(
    "shard_manifest_packing",
    oracle=f"""
    WITH cum AS (
        SELECT source, doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM documents
    ),
    assigned AS (
        SELECT source, doc_id, n_chars,
               cum_before // {SHARD_BUDGET_BYTES} AS shard_id
        FROM cum
    )
    SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM assigned GROUP BY source, shard_id
    """,
    tags=("text", "training_set", "shard_packing", "manifest",
          "two_phase", "no_global_sort"),
)
def shard_manifest_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style SHARD MANIFEST: pack each source's documents —
    in deterministic doc_id order — into ~{SHARD_BUDGET_BYTES}-byte
    shards (shard = cumulative-bytes-before ÷ budget, the standard
    streaming bin assignment), and emit per-shard accounting (doc
    count, bytes, id range) — the file-layout step between curation
    and the training job. The oracle is ONE running-sum window per
    source; the Spark plan is the TWO-PHASE prefix sum that survives
    100 TB: phase 1 aggregates byte totals per (source, doc_id-range
    bucket of {SHARD_BUCKET}); a window over that TINY bucket table
    yields each bucket's starting offset; phase 2 adds a within-bucket
    running sum — so no window ever orders more than one bucket's rows,
    and no source's full history serializes through one task (the same
    discipline as two_phase_global_quantiles; prefix sums decompose by
    associativity, so the two forms are exactly equal on integers)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    b = d.withColumn("bkt", (F.col("doc_id") / SHARD_BUCKET).cast("long"))
    bkt_tot = b.groupBy("source", "bkt").agg(
        F.sum("n_chars").alias("bkt_bytes")
    )
    w_bkt = (
        W.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = bkt_tot.select(
        "source", "bkt",
        F.coalesce(F.sum("bkt_bytes").over(w_bkt), F.lit(0)).alias("bkt_off"),
    )
    w_in = (
        W.partitionBy("source", "bkt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    assigned = (
        b.withColumn(
            "in_off", F.coalesce(F.sum("n_chars").over(w_in), F.lit(0))
        )
        .join(offsets, ["source", "bkt"])
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("bkt_off") + F.col("in_off")) / SHARD_BUDGET_BYTES
            ),
        )
    )
    return assigned.groupBy("source", "shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_bytes"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# --- classifier calibration / reliability report (round 7) ---
CALIB_BINS = 10  # fixed-width bins over mean_score in [-1, 1]


@register(
    "classifier_calibration_bins",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, ({h32_sql('w')}) % {CLF_BUCKETS} AS b, COUNT(*) AS c
        FROM tok GROUP BY doc_id, b
    ),
    weights AS (
        SELECT b,
               (('0x' || substr(md5('w-' || b), 1, 8))::BIGINT) % 2001 - 1000
                   AS w_milli
        FROM (SELECT unnest(range(0, {CLF_BUCKETS})) AS b)
    ),
    scored AS (
        SELECT f.doc_id,
               SUM(f.c) AS n_tokens,
               SUM(f.c * w.w_milli) AS s_milli,
               CAST(SUM(f.c * w.w_milli) AS DOUBLE)
                   / (1000.0 * CAST(SUM(f.c) AS DOUBLE)) AS mean_score
        FROM feats f JOIN weights w USING (b)
        GROUP BY f.doc_id
    ),
    labeled AS (
        SELECT s.*, (d.lang = 'en') AS label
        FROM scored s JOIN documents d USING (doc_id)
    ),
    binned AS (
        SELECT LEAST((s_milli + 1000 * n_tokens)
                         // ((2000 // {CALIB_BINS}) * n_tokens),
                     {CALIB_BINS - 1}) AS bin,
               mean_score, label
        FROM labeled
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS observed_rate,
           {dsum_sql('mean_score')} / CAST(COUNT(*) AS DOUBLE) AS avg_score
    FROM binned GROUP BY bin
    """,
    tags=("text", "classifier_eval", "calibration", "reliability",
          "model_scoring"),
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability report for the corpus quality
    classifier: bin documents by predicted score, compare each bin's
    OBSERVED positive rate (gold label: lang == 'en', the independent
    signal available at audit time) against its average predicted
    score — the table behind a reliability diagram and the threshold-
    picking step every classifier-driven curation pass needs (cf.
    classifier_eval_f1, which fixes ONE threshold; this shows all of
    them). Composes the registered linear_classifier_inference lineage
    (same hashed features, same integer milli weights). Bin assignment
    is EXACT integer arithmetic — (s + 1000n) div (200n) on longs, no
    float boundary can disagree between engines — and per-bin average
    score goes through exact decimal (dsum). Scale: inherits the
    classifier's one-scan shape; adds one broadcast-sized lang join
    keyed on doc_id and a {CALIB_BINS}-group agg."""
    scored = linear_classifier_inference(spark, sf_dir).select(
        "doc_id", "n_tokens", "score_milli", "mean_score"
    )
    lang = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("label")
    )
    width = 2000 // CALIB_BINS
    binned = scored.join(lang, "doc_id").select(
        F.least(
            F.expr(
                f"(score_milli + 1000 * n_tokens) div ({width} * n_tokens)"
            ),
            F.lit(CALIB_BINS - 1),
        ).cast("long").alias("bin"),
        "mean_score",
        "label",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias(
            "n_pos"
        ),
        (
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("observed_rate"),
        (dsum("mean_score") / F.count("*").cast("double")).alias("avg_score"),
    )


# --- priority sampling audit (Duffield-Lund-Thorup, round 7) -----------------
PRI_K = 8  # sample size per source


@register(
    "priority_sample_sources",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
               CAST(n_chars AS DOUBLE) * 4294967296.0
                 / ((('0x' || substr(md5('pri-' || doc_id), 1, 8))::BIGINT) + 1)
                 AS priority
        FROM documents
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY priority DESC, doc_id) AS rn
        FROM w
    ),
    tau AS (SELECT source, priority AS tau FROM ranked WHERE rn = {PRI_K} + 1),
    truth AS (SELECT source,
                     CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT)
                         AS true_total_chars
              FROM documents GROUP BY source)
    SELECT r.source AS source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           SUM(CASE WHEN r.w > t.tau THEN r.w ELSE t.tau END)
               AS ht_total_chars,
           MAX(truth.true_total_chars) AS true_total_chars
    FROM ranked r
    JOIN tau t ON r.source = t.source
    JOIN truth ON r.source = truth.source
    WHERE r.rn <= {PRI_K}
    GROUP BY r.source
    """,
    tags=("text_analysis", "bounded_broadcast", "sampling",
          "priority_sampling", "llm_data"),
)
def priority_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): per source
    keep the k docs with highest priority q_i = w_i / u_i (w = n_chars,
    u = md5-uniform in (0,1]), threshold tau = the (k+1)-th priority, and
    the Horvitz-Thompson estimate Σ max(w_i, tau) over the sample — the
    variance-optimal fixed-size weighted sample for subset-sum queries.
    The audit emits the HT estimate next to the true per-source total so
    a curation pipeline can certify its sampling error before swapping
    the sample in for the corpus. Plan: one scan, one window rank per
    source (WindowGroupLimit pushes the k+1 cutoff map-side), then a
    |sources|-row broadcast join of tau and the truth totals — nothing
    driver-side, no RNG (md5 order is cluster-size invariant). No
    reference counterpart (combiners.Sample at combiners.py is unweighted;
    cited by deterministic_sample).

    bounded_broadcast: the hinted build side is one threshold row per
    source (rn = k rank filter) — |sources|-bounded, a per-group limit
    the structural auditor cannot certify."""
    from pyspark.sql import Window as W

    from beam_pyspark_runner_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents")
    u_den = (
        h32(F.concat_ws("-", F.lit("pri"), F.col("doc_id"))) + F.lit(1)
    ).cast("double")
    w = d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("w"),
        (F.col("n_chars").cast("double") * F.lit(4294967296.0) / u_den).alias(
            "priority"
        ),
    )
    win = W.partitionBy("source").orderBy(F.col("priority").desc(), "doc_id")
    ranked = w.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= PRI_K + 1
    )
    tau = ranked.filter(F.col("rn") == PRI_K + 1).select(
        F.col("source").alias("t_source"), F.col("priority").alias("tau")
    )
    truth = d.groupBy(F.col("source").alias("g_source")).agg(
        F.sum(F.col("n_chars").cast("long")).alias("true_total_chars")
    )
    return (
        ranked.filter(F.col("rn") <= PRI_K)
        .join(F.broadcast(tau), F.col("source") == F.col("t_source"))
        .join(F.broadcast(truth), F.col("source") == F.col("g_source"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum(
                F.when(F.col("w") > F.col("tau"), F.col("w")).otherwise(
                    F.col("tau")
                )
            ).alias("ht_total_chars"),
            F.max("true_total_chars").alias("true_total_chars"),
        )
    )


# --- Flesch-style readability (round 7) --------------------------------------
@register(
    "flesch_readability",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id, source, n_words, n_syllables,
           206.835 - 1.015 * CAST(n_words AS DOUBLE)
                   - 84.6 * (CAST(n_syllables AS DOUBLE)
                             / CAST(n_words AS DOUBLE)) AS flesch
    FROM t
    """,
    tags=("text_analysis", "quality", "readability"),
)
def flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document: 206.835 - 1.015*(words/sentences)
    - 84.6*(syllables/word), with vowel-cluster runs as the standard
    syllable estimate and each synthetic doc scored as one sentence (the
    corpus has no sentence punctuation — documented fixture limit; on
    real text swap the sentence count for a terminator regex count).
    Companion to lm_fluency_score / gopher_quality_rules in the quality-
    scoring stack. Pure JVM regex + arithmetic in one codegen stage —
    embarrassingly parallel, no shuffle at any scale."""
    from beam_pyspark_runner_spark.sources.readers import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_syll = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[aeiou]+"), 0)
    ).cast("long")
    t = d.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    )
    return t.select(
        "doc_id",
        "source",
        "n_words",
        "n_syllables",
        (
            F.lit(206.835)
            - F.lit(1.015) * F.col("n_words").cast("double")
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.col("n_words").cast("double")
            )
        ).alias("flesch"),
    )


# --- per-source quantile pruning (round 7) -----------------------------------
@register(
    "quantile_prune_per_source",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
                   AS score
        FROM documents
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM t
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(n) // 4 AS BIGINT) AS n_pruned,
           MAX(CASE WHEN rn <= n // 4 THEN score END) AS cutoff_score
    FROM r GROUP BY source
    """,
    tags=("text_analysis", "quality", "pruning", "llm_data"),
)
def quantile_prune_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-quartile data pruning per source, the standard
    classifier-threshold curation move (keep the top 75% of each source
    by quality score so no single source is wiped out by a global
    cutoff): score = mean word length here as the stand-in for the
    model score linear_classifier_inference produces. The EXACT
    per-source cutoff comes from a ranked window — rank <= n/4 prunes —
    and the emitted (source, cutoff_score) table is what the production
    pipeline then applies as a cheap broadcast filter on the full
    corpus, so the expensive ranked pass runs once per stats refresh,
    not per scan. One window per source; at 100 TB swap the exact rank
    for two_phase_global_quantiles' bucket-histogram shape per source."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        (
            F.col("n_chars").cast("double")
            / F.size(F.split(F.col("text"), " "))
        ).alias("score"),
    )
    from pyspark.sql import Window as W

    r = t.select(
        "source",
        "score",
        F.row_number()
        .over(W.partitionBy("source").orderBy("score", "doc_id"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("source")).alias("n"),
    )
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.expr("max(n) div 4").cast("long").alias("n_pruned"),
        F.max(
            F.when(F.col("rn") <= F.expr("n div 4"), F.col("score"))
        ).alias("cutoff_score"),
    )


# --- equal-mixture epoch planning (round 7) ----------------------------------
MIX_BUDGET = 10_000_000  # training-token budget for the plan
MIX_MAX_EPOCHS = 4.0  # repeat cap per source before quality degrades


@register(
    "mixture_epoch_plan",
    oracle=f"""
    WITH t AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM t),
    flag AS (
        SELECT t.source, t.tokens,
               {MIX_BUDGET}.0 / n_sources AS alloc0,
               {MIX_BUDGET}.0 / n_sources > {MIX_MAX_EPOCHS} * t.tokens
                   AS capped
        FROM t, n
    ),
    g AS (
        SELECT CAST(SUM(CASE WHEN capped THEN tokens ELSE 0 END) AS BIGINT)
                   AS capped_tokens,
               CAST(SUM(CASE WHEN capped THEN 0 ELSE tokens END) AS BIGINT)
                   AS uncapped_tokens,
               CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_capped
        FROM flag
    )
    SELECT source, tokens, alloc0,
           alloc0 / tokens AS epochs_raw,
           capped,
           CASE WHEN capped THEN {MIX_MAX_EPOCHS}
                ELSE (alloc0 + (alloc0 * n_capped
                                - {MIX_MAX_EPOCHS} * capped_tokens)
                               * tokens / uncapped_tokens) / tokens
           END AS epochs_final
    FROM flag, g
    """,
    tags=("text_analysis", "mixture", "data_curation", "llm_data"),
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-mixture epoch plan under a token budget: give each source
    budget/n tokens; a source too small to absorb its share without
    exceeding {MIX_MAX_EPOCHS} epochs is capped there, and the freed
    budget is redistributed over the uncapped sources proportionally to
    their size (one redistribution round, documented). This is the
    repeat-factor table a pretraining run derives from corpus stats
    (cf. the data-constrained scaling literature's ~4-epoch usefulness
    cliff); temperature_sampling_weights is the sampling-probability
    twin, this one emits concrete epoch multipliers. Cost: one token
    count per source, then constant-size arithmetic over the
    |sources|-row frame with a 1-row broadcast of the global sums."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("tokens")
    )
    n = t.agg(F.count("*").cast("long").alias("n_sources"))
    alloc0 = F.lit(float(MIX_BUDGET)) / F.col("n_sources")
    capped = alloc0 > F.lit(MIX_MAX_EPOCHS) * F.col("tokens")
    flag = t.crossJoin(F.broadcast(n)).select(
        "source",
        "tokens",
        alloc0.alias("alloc0"),
        capped.alias("capped"),
    )
    g = flag.agg(
        F.sum(F.when(F.col("capped"), F.col("tokens")).otherwise(0))
        .cast("long")
        .alias("capped_tokens"),
        F.sum(F.when(F.col("capped"), 0).otherwise(F.col("tokens")))
        .cast("long")
        .alias("uncapped_tokens"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0))
        .cast("long")
        .alias("n_capped"),
    )
    leftover = F.col("alloc0") * F.col("n_capped") - F.lit(
        MIX_MAX_EPOCHS
    ) * F.col("capped_tokens")
    epochs_final = F.when(F.col("capped"), F.lit(MIX_MAX_EPOCHS)).otherwise(
        (
            F.col("alloc0")
            + leftover * F.col("tokens") / F.col("uncapped_tokens")
        )
        / F.col("tokens")
    )
    return flag.crossJoin(F.broadcast(g)).select(
        "source",
        "tokens",
        "alloc0",
        (F.col("alloc0") / F.col("tokens")).alias("epochs_raw"),
        "capped",
        epochs_final.alias("epochs_final"),
    )


# --- exact ROC AUC (round 7) --------------------------------------------------
@register(
    "roc_auc_exact",
    oracle=f"""
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT lang = 'en' AS truth,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE)
                 + CAST(len(list_filter(toks,
                       x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS score
          FROM t),
    vals AS (
        SELECT score,
               COUNT(*) FILTER (WHERE truth) AS c1,
               COUNT(*) FILTER (WHERE NOT truth) AS c0,
               COALESCE(SUM(COUNT(*)) OVER (
                   ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS below,
               COUNT(*) AS c
        FROM s GROUP BY score
    ),
    agg AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n_pos,
               CAST(SUM(c0) AS BIGINT) AS n_neg,
               CAST(SUM(c1 * (2 * below + c + 1)) AS BIGINT) AS rank_sum_x2
        FROM vals
    )
    SELECT n_pos, n_neg, rank_sum_x2,
           CAST(rank_sum_x2 - n_pos * (n_pos + 1) AS DOUBLE)
             / (2.0 * n_pos * n_neg) AS auc,
           CAST(rank_sum_x2 - n_pos * (n_pos + 1) AS DOUBLE)
             / (CAST(n_pos AS DOUBLE) * n_neg) - 1.0 AS gini
    FROM agg
    """,
    tags=("bounded_window", "text", "ml_eval", "roc_auc", "rank_statistic"),
)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of the repo's own lang-ID score (the
    classifier_eval_f1 scorer) against the fixture's lang labels — the
    threshold-free quality number beside that query's fixed-threshold
    confusion matrix. Computed as the rank statistic it literally is:
    AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋), the Mann-Whitney U identity, with
    tie midranks carried as the integer 2·midrank so everything through
    the final division is exact (no trapezoids, no binning — this IS the
    whole ROC integral). Gini = 2·AUC − 1 falls out of the same
    integers.

    Scale notes (100 TB): per-row scores are one scan; ranks come from
    the DISTINCT-SCORE table (mann_whitney_u pattern — the sort touches
    |distinct scores| rows); one conditional aggregate ends it. The
    standard eval stack computes AUC by collecting scores to one node;
    this stays distributed at every step."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    score = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
        + F.size(
            F.filter(toks, lambda x: x.isin("data", "query", "table"))
        ).cast("double")
        / n
    )
    s = d.select((F.col("lang") == "en").alias("truth"), score.alias("score"))
    wv = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    vals = (
        s.groupBy("score")
        .agg(
            F.count(F.when(F.col("truth"), 1)).alias("c1"),
            F.count(F.when(~F.col("truth"), 1)).alias("c0"),
            F.count("*").alias("c"),
        )
        .select(
            "c1",
            "c0",
            "c",
            F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("below"),
        )
    )
    agg = vals.agg(
        F.sum("c1").cast("long").alias("n_pos"),
        F.sum("c0").cast("long").alias("n_neg"),
        F.sum(F.col("c1") * (2 * F.col("below") + F.col("c") + 1))
        .cast("long")
        .alias("rank_sum_x2"),
    )
    num = (
        F.col("rank_sum_x2") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        "rank_sum_x2",
        (num / (2.0 * F.col("n_pos") * F.col("n_neg"))).alias("auc"),
        (
            num / (F.col("n_pos").cast("double") * F.col("n_neg")) - 1.0
        ).alias("gini"),
    )


# --- Cramér's V association (round 7) ------------------------------------------
@register(
    "cramers_v_association",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
    cm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells
           GROUP BY source),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    dense AS (
        SELECT rm.lang, cm.source, rm.r, cm.c, t.n, COALESCE(ce.o, 0) AS o
        FROM rm CROSS JOIN cm CROSS JOIN tot t
        LEFT JOIN cells ce ON ce.lang = rm.lang AND ce.source = cm.source
    ),
    folded AS (
        SELECT MAX(n) AS n,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS n_rows_dim,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cm) AS n_cols_dim,
               (SELECT list_reduce(
                    list(CAST((n * o - r * c) AS DOUBLE) * (n * o - r * c)
                         / (CAST(n AS DOUBLE) * r * c)
                         ORDER BY lang, source),
                    (a, b) -> a + b) FROM dense) AS chi2
        FROM dense
    )
    SELECT n, n_rows_dim AS n_langs, n_cols_dim AS n_sources, chi2,
           sqrt(chi2 / (CAST(n AS DOUBLE)
                * LEAST(n_rows_dim - 1, n_cols_dim - 1))) AS cramers_v
    FROM folded
    """,
    tags=("text", "statistics", "association", "chi_square", "effect_size"),
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between document language and source — the bounded
    [0,1] effect size chi_square_independence's raw statistic lacks
    (χ² grows with N; V answers "HOW associated", the number a corpus
    curator compares across datasets). χ² folds over the DENSE
    lang×source grid (zero cells contribute r·c/N — dropping them
    understates the statistic) as Σ(N·o − r·c)²/(N·r·c): each term is
    one fixed-order IEEE expression over exact integers, and the
    ~|langs|·|sources| terms sum via a (lang, source)-ORDERED fold on
    both engines (the anova_oneway k-group discipline). sqrt only at
    the end (repo-wide sqrt-yes/log-no line).

    Scale notes (100 TB): one partial-agg scan to the contingency
    cells; marginals and the dense grid live on the ≤|langs|·|sources|
    row table (broadcast crosses), so association costs one corpus
    pass regardless of scale."""
    cells = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("o"))
    )
    rm = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    dense = (
        rm.crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    term = (
        (F.col("n") * F.col("o") - F.col("r") * F.col("c")).cast("double")
        * (F.col("n") * F.col("o") - F.col("r") * F.col("c"))
        / (F.col("n").cast("double") * F.col("r") * F.col("c"))
    )
    folded = dense.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("lang"), F.col("source"), term.alias("t"))
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("chi2"),
    )
    return folded.select(
        "n",
        "n_langs",
        "n_sources",
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("n_langs") - 1, F.col("n_sources") - 1)
            )
        ).alias("cramers_v"),
    )



# --- T5 span-corruption targets (round 7) ---------------------------------------
SPAN_MOD = 13  # ~1/13 of positions start a span
SPAN_LEN = 3   # span covers positions [s, s+2]


@register(
    "span_corruption_targets",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, toks, unnest(range(0, len(toks))) AS j FROM t),
    flags AS (
        SELECT doc_id, j, toks[j + 1] AS tok,
               CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8))::BIGINT)
                         % 13 = 0 THEN 1 ELSE 0 END AS start_flag
        FROM pos
    ),
    m AS (
        SELECT doc_id, j, tok,
               MAX(start_flag) OVER (PARTITION BY doc_id ORDER BY j
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS masked
        FROM flags
    ),
    isl AS (
        SELECT *,
               CASE WHEN masked = 1 AND COALESCE(LAG(masked) OVER (
                        PARTITION BY doc_id ORDER BY j), 0) = 0
                    THEN 1 ELSE 0 END AS island_start
        FROM m
    ),
    sp AS (
        SELECT *,
               SUM(island_start) OVER (PARTITION BY doc_id ORDER BY j)
                   AS span_id
        FROM isl
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(masked) AS BIGINT) AS n_masked,
           CAST(COALESCE(MAX(span_id), 0) AS BIGINT) AS n_spans,
           COALESCE(string_agg(
               CASE WHEN masked = 0 THEN tok
                    WHEN island_start = 1
                    THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>'
               END, ' ' ORDER BY j), '') AS corrupted,
           COALESCE(string_agg(
               CASE WHEN masked = 1 THEN
                    CASE WHEN island_start = 1
                         THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR)
                              || '> ' || tok
                         ELSE tok END
               END, ' ' ORDER BY j), '') AS target
    FROM sp GROUP BY doc_id
    """,
    tags=("text", "llm_training", "span_corruption", "masking"),
)
def span_corruption_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style SPAN CORRUPTION (Raffel et al. JMLR'20) — the
    denoising pretraining objective: deterministic ~1/13 of
    positions seed a 3-token span (md5-derived, so both
    engines and every re-run corrupt identically — reproducible
    pretraining data, not RNG state); overlapping spans merge;
    each island is replaced by one <extra_id_k> sentinel in the
    corrupted input while the target enumerates sentinel + original
    tokens. The whole objective is window arithmetic: a ROWS
    3-frame max turns span seeds into masks, an island
    detector numbers the sentinels, and ordered string aggregation
    (position-sorted collect on the Spark side, string_agg ORDER BY
    on the oracle) rebuilds both sequences without any per-row
    Python.

    Scale notes (100 TB): explode is corpus-linear with window
    parallelism = documents; no joins, no driver state. The masking
    RATE is the only tunable — span statistics (n_masked/n_tokens ~=
    3/13) come out as audit columns for free."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    pos = d.select(
        "doc_id", F.posexplode("toks").alias("j", "tok")
    )
    start = (
        F.when(
            F.pmod(
                h32(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                F.lit(SPAN_MOD),
            )
            == 0,
            1,
        )
        .otherwise(0)
        .alias("start_flag")
    )
    wmask = (
        W.partitionBy("doc_id")
        .orderBy("j")
        .rowsBetween(-(SPAN_LEN - 1), W.currentRow)
    )
    wseq = W.partitionBy("doc_id").orderBy("j")
    m = pos.select(
        "doc_id", "j", "tok", F.max(start).over(wmask).alias("masked")
    )
    isl = m.withColumn(
        "island_start",
        F.when(
            (F.col("masked") == 1)
            & (F.coalesce(F.lag("masked").over(wseq), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    sp = isl.withColumn("span_id", F.sum("island_start").over(wseq))
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("span_id") - 1).cast("string"), F.lit(">")
    )
    corr_piece = F.when(F.col("masked") == 0, F.col("tok")).when(
        F.col("island_start") == 1, sentinel
    )
    tgt_piece = F.when(
        F.col("masked") == 1,
        F.when(
            F.col("island_start") == 1,
            F.concat(sentinel, F.lit(" "), F.col("tok")),
        ).otherwise(F.col("tok")),
    )

    def ordered_join(piece):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(F.col("j"), piece.alias("piece")),
                        )
                    )
                ),
                lambda x: x["piece"],
            ),
            " ",
        )

    return sp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("masked").cast("long").alias("n_masked"),
        F.coalesce(F.max("span_id"), F.lit(0)).cast("long").alias("n_spans"),
        ordered_join(corr_piece).alias("corrupted"),
        ordered_join(tgt_piece).alias("target"),
    )


# --- exact precision-recall curve (round 7) --------------------------------------
@register(
    "pr_curve_points",
    oracle=f"""
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT lang = 'en' AS truth,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE)
                 + CAST(len(list_filter(toks,
                       x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS score
          FROM t),
    vals AS (
        SELECT score,
               COUNT(*) FILTER (WHERE truth) AS c1,
               COUNT(*) FILTER (WHERE NOT truth) AS c0
        FROM s GROUP BY score
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_pos FROM vals),
    cum AS (
        SELECT score,
               CAST(SUM(c1) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
               CAST(SUM(c0) OVER (ORDER BY score DESC) AS BIGINT) AS fp
        FROM vals
    )
    SELECT score AS threshold, tp, fp,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision,
           CAST(tp AS DOUBLE) / n_pos AS recall,
           CAST(2 * tp AS DOUBLE) / (2 * tp + fp + (n_pos - tp)) AS f1
    FROM cum, tot
    """,
    tags=("bounded_window", "text", "ml_eval", "pr_curve", "rank_statistic"),
)
def pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT precision-recall curve of the lang-ID scorer — one
    (precision, recall, F1) point per distinct threshold, i.e. the
    complete curve with no interpolation (classifier_eval_f1 is one
    point of this table; roc_auc_exact is its rank integral; the best
    F1 row is the threshold a deployment should actually use). TP/FP
    at every threshold are DESCENDING cumulative counts over the
    distinct-score table, so each row's metrics are exact count
    ratios — the whole curve value-hashes.

    Scale notes (100 TB): same mann_whitney_u shape — one scan for
    scores, one |distinct scores|-row table, one ordered prefix.
    sklearn's precision_recall_curve collects the scores to one
    machine; this never does."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    score = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
        + F.size(
            F.filter(toks, lambda x: x.isin("data", "query", "table"))
        ).cast("double")
        / n
    )
    s = d.select((F.col("lang") == "en").alias("truth"), score.alias("score"))
    vals = s.groupBy("score").agg(
        F.count(F.when(F.col("truth"), 1)).alias("c1"),
        F.count(F.when(~F.col("truth"), 1)).alias("c0"),
    )
    tot = vals.agg(F.sum("c1").cast("long").alias("n_pos"))
    wd = W.orderBy(F.col("score").desc())
    cum = vals.select(
        F.col("score").alias("threshold"),
        F.sum("c1").over(wd).cast("long").alias("tp"),
        F.sum("c0").over(wd).cast("long").alias("fp"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "tp",
        "fp",
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias(
            "precision"
        ),
        (F.col("tp").cast("double") / F.col("n_pos")).alias("recall"),
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + (F.col("n_pos") - F.col("tp")))
        ).alias("f1"),
    )


# --- isotonic (PAVA) score calibration (round 7, session 4) -----------------
_PAVA_BASE_SQL = f"""
    tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, ({h32_sql('w')}) % {{buckets}} AS b, COUNT(*) AS c
        FROM tok GROUP BY doc_id, b
    ),
    weights AS (
        SELECT b,
               (('0x' || substr(md5('w-' || b), 1, 8))::BIGINT) % 2001 - 1000
                   AS w_milli
        FROM (SELECT unnest(range(0, {{buckets}})) AS b)
    ),
    scored AS (
        SELECT f.doc_id, SUM(f.c) AS n_tokens, SUM(f.c * w.w_milli) AS s_milli
        FROM feats f JOIN weights w USING (b)
        GROUP BY f.doc_id
    ),
    labeled AS (
        SELECT s.*, (d.lang = 'en') AS label
        FROM scored s JOIN documents d USING (doc_id)
    ),
    bc AS (
        SELECT LEAST((s_milli + 1000 * n_tokens)
                         // ((2000 // {{bins}}) * n_tokens),
                     {{bins}} - 1) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM labeled GROUP BY bin
    )
"""


@register(
    "isotonic_calibration",
    oracle=f"""
    WITH {_PAVA_BASE_SQL.format(buckets=CLF_BUCKETS, bins=CALIB_BINS)},
    idx AS (
        SELECT bin, n, p,
               ROW_NUMBER() OVER (ORDER BY bin) AS i,
               SUM(n) OVER (ORDER BY bin) AS cn,
               SUM(p) OVER (ORDER BY bin) AS cp
        FROM bc
    ),
    pairs AS (
        SELECT j.i AS ji, k.i AS ki,
               CAST(k.cp - j.cp + j.p AS DOUBLE)
                   / CAST(k.cn - j.cn + j.n AS DOUBLE) AS iavg
        FROM idx j JOIN idx k ON j.i <= k.i
    ),
    inner_min AS (
        SELECT b.i AS i, b.bin AS bin, b.n AS n, b.p AS p, pr.ji,
               MIN(pr.iavg) AS m
        FROM idx b JOIN pairs pr ON pr.ji <= b.i AND pr.ki >= b.i
        GROUP BY b.i, b.bin, b.n, b.p, pr.ji
    )
    SELECT CAST(bin AS BIGINT) AS bin, n AS n_docs, p AS n_pos,
           CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS observed_rate,
           MAX(m) AS fitted_rate
    FROM inner_min GROUP BY i, bin, n, p
    """,
    # bounded_cross: the minimax interval joins are theta joins
    # (ji <= ki; ji <= i <= ki) over the CALIB_BINS-row bin table —
    # O(B³) on B = CALIB_BINS ≈ a thousand broadcast-side rows at any
    # corpus size. The structural walker cannot prove it: the bin grain
    # comes from least(score_div, CALIB_BINS - 1), whose upper clamp
    # bounds the image only because the dividend is non-negative by
    # construction — a fact plan text does not carry (round-12
    # cartesian-class audit widening).
    tags=("bounded_window", "bounded_cross", "text", "classifier_eval",
          "calibration", "isotonic", "pava", "model_scoring"),
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAVA) calibration of the corpus quality
    classifier — the nonparametric upgrade of
    classifier_calibration_bins: instead of REPORTING each bin's
    observed positive rate (which can be non-monotone from noise), fit
    the best monotone rate curve, the standard way a filtering
    classifier's scores become usable probabilities (Zadrozny & Elkan
    KDD'02). Uses the minimax characterization — fitted(b) =
    max_{{j≤b}} min_{{k≥b}} (pos[j..k] / n[j..k]) — which needs NO
    sequential pooling loop: interval rates come from prefix sums, and
    the whole fit is two tiny joins over the {CALIB_BINS}-row bin
    table (O(B³) on B = {CALIB_BINS} rows ≈ a thousand broadcast-side
    rows, independent of corpus size; the corpus is touched exactly
    once by the classifier pass). Interval rates are integer/integer
    single divisions, and MIN/MAX over exact doubles — bit-identical
    across engines. Equivalence of the minimax form to the
    stack-based PAVA (monotonicity + block-mean preservation) is
    certified against an independent Python implementation in
    tests/test_properties.py."""
    bins = classifier_calibration_bins(spark, sf_dir).select(
        "bin",
        F.col("n_docs").alias("n"),
        F.col("n_pos").alias("p"),
    )
    wo = W.orderBy("bin")
    idx = bins.select(
        "bin",
        "n",
        "p",
        F.row_number().over(wo).alias("i"),
        F.sum("n").over(wo).alias("cn"),
        F.sum("p").over(wo).alias("cp"),
    )
    j = idx.select(
        F.col("i").alias("ji"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
        F.col("n").alias("jn"),
        F.col("p").alias("jp"),
    )
    k = idx.select(
        F.col("i").alias("ki"),
        F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    pairs = j.join(k, F.col("ji") <= F.col("ki")).select(
        "ji",
        "ki",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jp")).cast("double")
            / (F.col("kcn") - F.col("jcn") + F.col("jn")).cast("double")
        ).alias("iavg"),
    )
    inner = (
        idx.join(
            pairs,
            (F.col("ji") <= F.col("i")) & (F.col("ki") >= F.col("i")),
        )
        .groupBy("i", "bin", "n", "p", "ji")
        .agg(F.min("iavg").alias("m"))
    )
    return inner.groupBy("i", "bin", "n", "p").agg(
        F.max("m").alias("fitted_rate")
    ).select(
        "bin",
        F.col("n").alias("n_docs"),
        F.col("p").alias("n_pos"),
        (F.col("p").cast("double") / F.col("n").cast("double")).alias(
            "observed_rate"
        ),
        "fitted_rate",
    )


# --- Brier score decomposition (round 7, session 4) -------------------------
def _decsum_sql(expr: str) -> str:
    """Full-scale decimal sum (no 2-decimal re-round, unlike dsum_sql):
    for sums whose DECIMAL(38,10) unscaled value stays < 2^53 the final
    cast is one correctly-rounded step in both engines, and the extra
    precision is what keeps Brier = REL - RES + UNC inside 1e-9."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE)"


@register(
    "brier_score_decomposition",
    oracle=f"""
    WITH {_PAVA_BASE_SQL.format(buckets=CLF_BUCKETS, bins=CALIB_BINS)},
    fb AS (
        SELECT bin, n, p,
               CAST(2 * bin + 1 AS DOUBLE) / {2 * CALIB_BINS} AS f,
               CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS ob
        FROM bc
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(p) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS obar
        FROM bc
    )
    SELECT t.nn AS n,
           {_decsum_sql('f.p * (1.0 - f.f) * (1.0 - f.f)'
                     ' + (f.n - f.p) * f.f * f.f')}
               / CAST(t.nn AS DOUBLE) AS brier,
           {_decsum_sql('f.n * (f.f - f.ob) * (f.f - f.ob)')}
               / CAST(t.nn AS DOUBLE) AS reliability,
           {_decsum_sql('f.n * (f.ob - t.obar) * (f.ob - t.obar)')}
               / CAST(t.nn AS DOUBLE) AS resolution,
           MAX(t.obar * (1.0 - t.obar)) AS uncertainty,
           abs({_decsum_sql('f.p * (1.0 - f.f) * (1.0 - f.f)'
                         ' + (f.n - f.p) * f.f * f.f')}
                   / CAST(t.nn AS DOUBLE)
               - ({_decsum_sql('f.n * (f.f - f.ob) * (f.f - f.ob)')}
                      / CAST(t.nn AS DOUBLE)
                  - {_decsum_sql('f.n * (f.ob - t.obar) * (f.ob - t.obar)')}
                      / CAST(t.nn AS DOUBLE)
                  + MAX(t.obar * (1.0 - t.obar)))) < 1e-9 AS identity_ok
    FROM fb f, tot t GROUP BY t.nn
    """,
    tags=("text", "classifier_eval", "brier", "calibration",
          "model_scoring"),
)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the quality classifier's Brier
    score into reliability − resolution + uncertainty — the one-row
    report that says WHY a filtering classifier's probabilistic error
    is what it is: miscalibration (reliability, fixable by
    isotonic_calibration), lack of discrimination (resolution), or
    irreducible base-rate entropy (uncertainty). Forecast per bin is
    the bin-midpoint probability (2b+1)/{2 * CALIB_BINS}, constant
    within bins, which is exactly the regime where the decomposition
    identity Brier = REL − RES + UNC holds — and the identity_ok
    column re-derives both sides independently as the built-in
    self-check (computed from identical doubles in both engines, so
    the boolean value-hashes). Every Σ over bins goes through exact
    decimal (dsum) so the {CALIB_BINS}-term sums cannot reorder
    differently across engines. Scale: one classifier pass over the
    corpus (shared lineage with classifier_calibration_bins), then
    constant-size bin arithmetic."""
    bins = classifier_calibration_bins(spark, sf_dir).select(
        "bin",
        F.col("n_docs").alias("n"),
        F.col("n_pos").alias("p"),
    )
    fb = bins.select(
        "bin",
        "n",
        "p",
        ((2 * F.col("bin") + 1).cast("double") / (2 * CALIB_BINS)).alias("f"),
        (F.col("p").cast("double") / F.col("n").cast("double")).alias("ob"),
    )
    tot = bins.agg(
        F.sum("n").cast("long").alias("nn"),
        (
            F.sum("p").cast("double") / F.sum("n").cast("double")
        ).alias("obar"),
    )
    j = fb.crossJoin(F.broadcast(tot))
    brier_term = (
        F.col("p") * (1.0 - F.col("f")) * (1.0 - F.col("f"))
        + (F.col("n") - F.col("p")) * F.col("f") * F.col("f")
    )
    rel_term = (
        F.col("n") * (F.col("f") - F.col("ob")) * (F.col("f") - F.col("ob"))
    )
    res_term = (
        F.col("n")
        * (F.col("ob") - F.col("obar"))
        * (F.col("ob") - F.col("obar"))
    )
    def _decsum(col):
        # Spark twin of _decsum_sql: full-scale decimal accumulation
        return F.sum(col.cast("decimal(38,10)")).cast("double")

    agg = j.groupBy("nn").agg(
        (_decsum(brier_term) / F.col("nn").cast("double")).alias("brier"),
        (_decsum(rel_term) / F.col("nn").cast("double")).alias("reliability"),
        (_decsum(res_term) / F.col("nn").cast("double")).alias("resolution"),
        F.max(F.col("obar") * (1.0 - F.col("obar"))).alias("uncertainty"),
    )
    return agg.select(
        F.col("nn").alias("n"),
        "brier",
        "reliability",
        "resolution",
        "uncertainty",
        (
            F.abs(
                F.col("brier")
                - (
                    F.col("reliability")
                    - F.col("resolution")
                    + F.col("uncertainty")
                )
            )
            < 1e-9
        ).alias("identity_ok"),
    )


# --- RAKE keyphrase extraction (round 7, session 4) -------------------------
# Phrase boundaries: the corpus' function words. Breaking is done with
# PLAIN string replace on space-doubled text (every word owns its
# delimiting spaces), so no regex dialect is involved anywhere in the
# phrase walk; the only regex is the final ' +' squeeze.
_RAKE_STOPS = ("the", "a")
_RAKE_TOPN = 25


@register(
    "rake_keyphrases",
    oracle=f"""
    WITH padded AS (
        SELECT doc_id,
               ' ' || replace(text, ' ', '  ') || ' ' AS s
        FROM documents
    ),
    broken AS (
        SELECT doc_id,
               {" ".join(f"replace(" for _ in _RAKE_STOPS)}s
               {"".join(f", ' {w} ', '|')" for w in _RAKE_STOPS)} AS s
        FROM padded
    ),
    ph AS (
        SELECT doc_id,
               trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
        FROM broken, unnest(string_split(s, '|')) AS t(p)
        WHERE trim(regexp_replace(p, ' +', ' ', 'g')) <> ''
    ),
    pw AS (
        SELECT phrase, len(string_split(phrase, ' ')) AS plen,
               unnest(string_split(phrase, ' ')) AS w
        FROM ph
    ),
    wstat AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS deg
        FROM pw GROUP BY w
    ),
    wscore AS (
        SELECT w, (1000000 * deg) // freq AS micro FROM wstat
    ),
    pdistinct AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(len(string_split(phrase, ' ')) AS BIGINT) AS phrase_len
        FROM ph GROUP BY phrase
    ),
    pscore AS (
        SELECT p.phrase, p.n_occurrences, p.phrase_len,
               CAST(SUM(ws.micro) AS BIGINT) AS score_micro
        FROM pdistinct p,
             unnest(string_split(p.phrase, ' ')) AS t(w)
             JOIN wscore ws ON ws.w = t.w
        GROUP BY p.phrase, p.n_occurrences, p.phrase_len
    )
    SELECT phrase, n_occurrences, phrase_len, score_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC,
                                   n_occurrences DESC, phrase) AS BIGINT)
               AS rank
    FROM pscore
    QUALIFY rank <= {_RAKE_TOPN}
    """,
    tags=("bounded_window", "text", "rake", "keyphrase_extraction", "nlp"),
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) corpus-wide: break
    word streams into candidate phrases at stopword boundaries, score
    each word by degree/frequency (degree = Σ length of phrases it
    occurs in — words that travel in long multi-word phrases outrank
    equally-frequent loners), and score a phrase as the sum of its
    words' scores — the zero-training keyphrase extractor a curation
    pipeline runs to label what a corpus is ABOUT (cf. tfidf_top_terms,
    which needs a background corpus; RAKE does not). Word scores are
    integer MICRO-units (⌊1e6·deg/freq⌋) so phrase scores are exact
    integer sums — no float ordering anywhere until none. Phrase
    breaking uses plain string replace on space-doubled text (no regex
    dialect risk; the lone regex is the ' +' squeeze both engines
    define identically). Scale: two explodes (phrases, words) with
    partial aggregation on both keys, one word-stats shuffle join back
    to phrase words, and a global top-{_RAKE_TOPN} (rank window over
    the per-phrase aggregate — the tiny distinct-phrase table, not the
    corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    padded = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.expr("replace(text, ' ', '  ')"),
            F.lit(" "),
        ).alias("s"),
    )
    brk = "s"
    for w in _RAKE_STOPS:
        brk = f"replace({brk}, ' {w} ', '|')"
    broken = padded.select("doc_id", F.expr(brk).alias("s"))
    ph = (
        broken.select(
            "doc_id",
            F.explode(F.split(F.col("s"), "[|]")).alias("p"),
        )
        .select(
            "doc_id",
            F.trim(F.regexp_replace(F.col("p"), " +", " ")).alias("phrase"),
        )
        .filter(F.col("phrase") != "")
    )
    pw = ph.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    wscore = (
        pw.groupBy("w")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .select(
            "w",
            F.expr("(1000000 * deg) div freq").alias("micro"),
        )
    )
    pdistinct = ph.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.size(F.split(F.first("phrase"), " ")).cast("long").alias(
            "phrase_len"
        ),
    )
    pscore = (
        pdistinct.select(
            "phrase",
            "n_occurrences",
            "phrase_len",
            F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        )
        .join(wscore, "w")
        .groupBy("phrase", "n_occurrences", "phrase_len")
        .agg(F.sum("micro").cast("long").alias("score_micro"))
    )
    # TakeOrdered heap for the global top-N phrases; the rank window
    # runs over the bounded {_RAKE_TOPN}-row result (bounded_window).
    wr = W.orderBy(
        F.col("score_micro").desc(), F.col("n_occurrences").desc(), "phrase"
    )
    top = pscore.orderBy(
        F.col("score_micro").desc(), F.col("n_occurrences").desc(), "phrase"
    ).limit(_RAKE_TOPN)
    return top.withColumn("rank", F.row_number().over(wr).cast("long"))


# --- uncertainty (margin) sampling for annotation (round 7, session 4) ------
_MARGIN_N = 25


@register(
    "uncertainty_margin_sample",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, ({h32_sql('w')}) % {CLF_BUCKETS} AS b, COUNT(*) AS c
        FROM tok GROUP BY doc_id, b
    ),
    weights AS (
        SELECT b,
               (('0x' || substr(md5('w-' || b), 1, 8))::BIGINT) % 2001 - 1000
                   AS w_milli
        FROM (SELECT unnest(range(0, {CLF_BUCKETS})) AS b)
    ),
    scored AS (
        SELECT f.doc_id,
               CAST(SUM(f.c) AS BIGINT) AS n_tokens,
               CAST(SUM(f.c * w.w_milli) AS BIGINT) AS score_milli
        FROM feats f JOIN weights w USING (b)
        GROUP BY f.doc_id
    ),
    ranked AS (
        SELECT s.doc_id, d.source, s.n_tokens, s.score_milli,
               abs(s.score_milli) AS margin_milli,
               ROW_NUMBER() OVER (ORDER BY abs(s.score_milli), s.doc_id)
                   AS rank
        FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, source, n_tokens, score_milli,
           CAST(margin_milli AS BIGINT) AS margin_milli,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_MARGIN_N}
    """,
    tags=("bounded_window", "text", "active_learning", "uncertainty_sampling",
          "model_scoring", "annotation"),
)
def uncertainty_margin_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based uncertainty sampling (Lewis & Gale SIGIR'94) over
    the corpus quality classifier: surface the {_MARGIN_N} documents
    whose raw score sits CLOSEST to the keep/drop threshold — exactly
    the rows where human labels buy the most classifier improvement per
    annotation dollar, and the selection loop every
    classifier-curated 100 TB corpus runs between training rounds
    (score → pick the margin band → label → retrain). Composes the
    linear_classifier_inference lineage verbatim (same hashed
    features, same integer milli weights: the threshold is
    {CLF_THRESHOLD_MILLI}, so margin = |score_milli| is already in
    integer milli-units — no float compare anywhere). The global
    bottom-{_MARGIN_N} is a TakeOrdered heap over the per-doc
    aggregate (map-side partial top-k, no full sort), with doc_id
    tie-break for engine-identical selection; source rides along so
    the annotation batch can be audited for source skew before
    labeling."""
    scored = linear_classifier_inference(spark, sf_dir).select(
        "doc_id", "n_tokens", "score_milli"
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = (
        scored.join(src, "doc_id")
        .withColumn("margin_milli", F.abs(F.col("score_milli")).cast("long"))
        # TakeOrdered heap for the global bottom-N margins; the rank
        # window runs over the bounded {_MARGIN_N}-row heap result
        # only (bounded_window).
        .orderBy("margin_milli", "doc_id")
        .limit(_MARGIN_N)
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.col("margin_milli"), F.col("doc_id")))
            .cast("long"),
        )
    )
    return ranked.select(
        "doc_id", "source", "n_tokens", "score_milli", "margin_milli", "rank"
    )


# --- expected calibration error over the reliability bins (round 8) ---------
from beam_pyspark_runner_spark.queries.registry import REGISTRY as _TXT_REG


@register(
    "expected_calibration_error",
    oracle=f"""
    WITH bins AS ({{_CALIB_BINS_ORACLE}})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           {dsum_sql("CAST(n_docs AS DOUBLE)"
                     " * abs(observed_rate - (avg_score + 1.0) / 2.0)")}
               / CAST(SUM(n_docs) AS DOUBLE) AS ece,
           MAX(abs(observed_rate - (avg_score + 1.0) / 2.0)) AS mce
    FROM bins
    """,
    tags=("text", "classifier_eval", "calibration", "ece", "model_scoring"),
)
def expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (Naeini et al. AAAI'15) + max gap
    (MCE) over the registered reliability bins — the single-number
    summary a model-gating pipeline thresholds on where
    classifier_calibration_bins is the full diagram. Composes the
    registered bin oracle as a CTE so the two can never drift.
    Confidence maps the classifier's mean score from [-1, 1] to
    [0, 1]; per-bin gaps are identical doubles in both engines, the
    n·|gap| sum goes through exact decimal (dsum) so the ≤{CALIB_BINS}-
    term accumulation is order-free, and the final division happens
    once. Scale: one {CALIB_BINS}-row aggregate on top of the
    classifier's one-scan shape."""
    bins = classifier_calibration_bins(spark, sf_dir)
    conf = (F.col("avg_score") + F.lit(1.0)) / F.lit(2.0)
    gap = F.abs(F.col("observed_rate") - conf)
    return bins.select(F.col("n_docs"), gap.alias("gap")).agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        (
            dsum(F.col("n_docs").cast("double") * F.col("gap"))
            / F.sum("n_docs").cast("double")
        ).alias("ece"),
        F.max("gap").alias("mce"),
    )


# patch the composed CTE in after registration (keeps the single source
# of truth in classifier_calibration_bins' own registration)
_TXT_REG["expected_calibration_error"].oracle = _TXT_REG[
    "expected_calibration_error"
].oracle.replace(
    "{_CALIB_BINS_ORACLE}", _TXT_REG["classifier_calibration_bins"].oracle
)


# --- multiclass language-ID eval: macro/micro F1 (round 8) -------------------
# One marker token per language; prediction = argmax marker count with
# lexicographic tie-break. The predictor is a deterministic stand-in
# (the fixture corpus shares one vocabulary across langs); the metric
# plumbing — confusion counts, per-class P/R/F1, macro averaging — is
# the artifact under test.
_LANG_MARKERS = (("de", "table"), ("en", "the"), ("es", "row"),
                 ("fr", "a"), ("zh", "data"))


def _argmax_case_sql() -> str:
    langs = [l for l, _ in _LANG_MARKERS]
    clauses = []
    for i, l in enumerate(langs):
        conds = " AND ".join(
            f"c_{l} >= c_{o}" for o in langs[i + 1:]
        )
        clauses.append(f"WHEN {conds or 'TRUE'} THEN '{l}'")
    return "CASE " + " ".join(clauses) + " END"


@register(
    "macro_f1_lang_multiclass",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               {", ".join(
                   f"len(list_filter(toks, x -> x = '{m}')) AS c_{l}"
                   for l, m in _LANG_MARKERS
               )}
        FROM t
    ),
    pred AS (SELECT lang, {_argmax_case_sql()} AS predicted FROM scored),
    cls AS (
        SELECT l.lang,
               CAST(SUM(CASE WHEN p.lang = l.lang AND p.predicted = l.lang
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN p.lang <> l.lang AND p.predicted = l.lang
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN p.lang = l.lang AND p.predicted <> l.lang
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM pred p CROSS JOIN
             (SELECT unnest(['de','en','es','fr','zh']) AS lang) l
        GROUP BY l.lang
    ),
    prf AS (
        SELECT lang, tp, fp, fn,
               CASE WHEN tp + fp = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
               END AS precision,
               CASE WHEN tp + fn = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
               END AS recall,
               CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE 2.0 * CAST(tp AS DOUBLE)
                         / CAST(2 * tp + fp + fn AS DOUBLE)
               END AS f1
        FROM cls
    ),
    macro AS (SELECT {dsum_sql('f1')} / 5.0 AS macro_f1 FROM prf)
    SELECT p.lang, p.tp, p.fp, p.fn, p.precision, p.recall, p.f1, m.macro_f1
    FROM prf p CROSS JOIN macro m
    """,
    tags=("text", "classifier_eval", "multiclass", "macro_f1", "lang_id",
          "model_scoring"),
)
def macro_f1_lang_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass language-ID evaluation: per-class precision/recall/F1
    from the full 5x5 confusion, plus macro-F1 — the report card for a
    lang-ID stage of a corpus pipeline (classifier_eval_f1 is the
    binary en-vs-rest cut; this is the per-language view that shows
    WHICH languages leak). F1 = 2tp/(2tp+fp+fn) avoids the P/R
    intermediate division (one rational per cell → value-hashes);
    zero-denominator classes score 0.0 by convention (documented,
    matched in SQL). Macro averaging runs through exact decimal (dsum)
    so the 5-term sum is order-free. Scale: one tokenize scan → 5
    conditional counts per doc → one 5-group aggregate; the per-class
    fan-out joins a broadcast 5-row class list."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    def _marker_count(marker: str) -> Column:
        # a two-arg lambda would be read as (element, index) by F.filter
        return F.size(F.filter(toks, lambda x: x == F.lit(marker)))

    scored = d.select(
        "lang",
        *[_marker_count(m).alias(f"c_{l}") for l, m in _LANG_MARKERS],
    )
    langs = [l for l, _ in _LANG_MARKERS]
    # chained CASE, written exactly as the SQL argmax does it
    pred = F.when(
        (F.col("c_de") >= F.col("c_en")) & (F.col("c_de") >= F.col("c_es"))
        & (F.col("c_de") >= F.col("c_fr")) & (F.col("c_de") >= F.col("c_zh")),
        F.lit("de"),
    ).when(
        (F.col("c_en") >= F.col("c_es")) & (F.col("c_en") >= F.col("c_fr"))
        & (F.col("c_en") >= F.col("c_zh")),
        F.lit("en"),
    ).when(
        (F.col("c_es") >= F.col("c_fr")) & (F.col("c_es") >= F.col("c_zh")),
        F.lit("es"),
    ).when(F.col("c_fr") >= F.col("c_zh"), F.lit("fr")).otherwise(F.lit("zh"))
    p = scored.select("lang", pred.alias("predicted"))
    # VALUES, not createDataFrame: the literal class list plans as a
    # LocalRelation (provably bounded to the audit, constant-foldable)
    # instead of an opaque LogicalRDD (round-10).
    classes = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{lang}')" for lang in langs)
        + " AS classes(cls)"
    )
    cls = (
        p.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("predicted") == F.col("cls")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when(
                    (F.col("lang") != F.col("cls"))
                    & (F.col("predicted") == F.col("cls")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("predicted") != F.col("cls")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("fn"),
        )
    )
    precision = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
    )
    recall = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double")
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0.0)
    ).otherwise(
        F.lit(2.0) * F.col("tp").cast("double")
        / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
    )
    prf = cls.select(
        F.col("cls").alias("lang"), "tp", "fp", "fn",
        precision.alias("precision"), recall.alias("recall"), f1.alias("f1"),
    )
    macro = prf.agg((dsum("f1") / F.lit(5.0)).alias("macro_f1"))
    return prf.crossJoin(F.broadcast(macro))


# --- McNemar's paired-classifier test (round 8) -----------------------------
@register(
    "mcnemar_paired_classifiers",
    oracle=f"""
    WITH clf AS ({{_CLF_ORACLE}}),
    t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    rule AS (
        SELECT doc_id, lang,
               100 * (len(list_filter(toks, x -> x IN ({_SW_SQL})))
                      + len(list_filter(toks,
                            x -> x IN ('data', 'query', 'table'))))
                   > 12 * len(toks) AS pred_a
        FROM t
    ),
    paired AS (
        SELECT (r.lang = 'en') = r.pred_a AS a_right,
               (r.lang = 'en') = (c.score_milli > 0) AS b_right
        FROM rule r JOIN clf c USING (doc_id)
    )
    SELECT CAST(SUM(CASE WHEN a_right AND b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both_right,
           CAST(SUM(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS b,
           CAST(SUM(CASE WHEN NOT a_right AND b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
           CAST(SUM(CASE WHEN NOT a_right AND NOT b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both_wrong,
           CASE WHEN SUM(CASE WHEN a_right <> b_right THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE CAST((abs(SUM(CASE WHEN a_right AND NOT b_right
                                        THEN 1 ELSE 0 END)
                               - SUM(CASE WHEN NOT a_right AND b_right
                                          THEN 1 ELSE 0 END)) - 1)
                          * (abs(SUM(CASE WHEN a_right AND NOT b_right
                                          THEN 1 ELSE 0 END)
                                 - SUM(CASE WHEN NOT a_right AND b_right
                                            THEN 1 ELSE 0 END)) - 1) AS DOUBLE)
                     / CAST(SUM(CASE WHEN a_right <> b_right THEN 1 ELSE 0 END)
                            AS DOUBLE)
           END AS mcnemar_chi2
    FROM paired
    """,
    tags=("text", "classifier_eval", "mcnemar", "paired_test", "statistics",
          "model_scoring"),
)
def mcnemar_paired_classifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) comparing two corpus
    quality classifiers on the SAME documents — the statistically
    correct way to decide 'is classifier B actually better than A'
    when both score one corpus (independent-sample tests overstate
    significance on paired data). A = the token-ratio rule from
    classifier_eval_f1 written as an INTEGER cross-multiplication
    (100·hits > 12·n_tokens — no float boundary), B = the registered
    hashed-feature linear classifier (score > 0), gold = lang == 'en'.
    Only the discordant counts b (A right, B wrong) and c (B right,
    A wrong) carry signal: χ² = (|b−c|−1)²/(b+c), exact integers until
    one final division (NULL when b+c = 0). The classifier leg
    composes the registered oracle as a CTE. Scale: two one-scan
    aggregates joined on doc_id, then a single 4-cell reduce."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) + F.size(
        F.filter(toks, lambda x: x.isin("data", "query", "table"))
    )
    rule = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("truth"),
        (100 * hits > 12 * F.size(toks)).alias("pred_a"),
    )
    clf = linear_classifier_inference(spark, sf_dir).select(
        "doc_id", (F.col("score_milli") > 0).alias("pred_b")
    )
    paired = rule.join(clf, "doc_id").select(
        (F.col("truth") == F.col("pred_a")).alias("a_right"),
        (F.col("truth") == F.col("pred_b")).alias("b_right"),
    )
    b = F.sum(
        F.when(F.col("a_right") & ~F.col("b_right"), 1).otherwise(0)
    ).cast("long")
    c = F.sum(
        F.when(~F.col("a_right") & F.col("b_right"), 1).otherwise(0)
    ).cast("long")
    disc = b + c
    stat = F.when(disc == 0, F.lit(None).cast("double")).otherwise(
        ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double")
        / disc.cast("double")
    )
    return paired.agg(
        F.sum(F.when(F.col("a_right") & F.col("b_right"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_right"),
        b.alias("b"),
        c.alias("c"),
        F.sum(F.when(~F.col("a_right") & ~F.col("b_right"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_wrong"),
        stat.alias("mcnemar_chi2"),
    )


_TXT_REG["mcnemar_paired_classifiers"].oracle = _TXT_REG[
    "mcnemar_paired_classifiers"
].oracle.replace(
    "{_CLF_ORACLE}", _TXT_REG["linear_classifier_inference"].oracle
)


# --- Fleiss' kappa over three deterministic raters (round 8) ----------------
_FLEISS_CHARS = 900  # rater 3: long-document cut, fixed literal


@register(
    "fleiss_kappa_multirater",
    oracle=f"""
    WITH clf AS ({{_CLF_ORACLE}}),
    t AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS toks
        FROM documents
    ),
    votes AS (
        SELECT (CASE WHEN 100 * len(list_filter(toks, x -> x IN ({_SW_SQL})))
                          > 8 * len(toks) THEN 1 ELSE 0 END)
               + (CASE WHEN c.score_milli > 0 THEN 1 ELSE 0 END)
               + (CASE WHEN t.n_chars > {_FLEISS_CHARS} THEN 1 ELSE 0 END)
                   AS n_pos
        FROM t JOIN clf c USING (doc_id)
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_pos) AS BIGINT) AS s1,
               CAST(SUM(n_pos * n_pos) AS BIGINT) AS s2
        FROM votes
    )
    SELECT n AS n_docs,
           CAST(s2 - 3 * s1 + 3 * n AS DOUBLE) / CAST(3 * n AS DOUBLE)
               AS p_bar,
           (CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
           + (CAST(3 * n - s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
               * (CAST(3 * n - s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
               AS p_e,
           (CAST(s2 - 3 * s1 + 3 * n AS DOUBLE) / CAST(3 * n AS DOUBLE)
            - ((CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
               + (CAST(3 * n - s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
                 * (CAST(3 * n - s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))))
           / (1.0 - ((CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
                     + (CAST(3 * n - s1 AS DOUBLE) / CAST(3 * n AS DOUBLE))
                       * (CAST(3 * n - s1 AS DOUBLE)
                          / CAST(3 * n AS DOUBLE))))
               AS fleiss_kappa
    FROM s
    """,
    tags=("text", "classifier_eval", "fleiss_kappa", "agreement",
          "statistics", "model_scoring"),
)
def fleiss_kappa_multirater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE raters on binary labels — the
    multi-annotator agreement statistic (cohens_kappa_agreement is the
    2-rater case) a labeling pipeline reports before trusting majority
    vote. Raters: the stopword-density rule (integer cross-multiply,
    ratio > 0.08), the registered linear classifier (score > 0), and a
    document-length cut (> {_FLEISS_CHARS} chars). For n=3 raters and
    2 categories, per-doc agreement collapses to the closed form
    Σ(n_pos² − 3·n_pos + 3) — so κ needs only N, Σn_pos, Σn_pos²:
    THREE exact integers from one aggregate. P̄, P_e and κ are then a
    fixed-order scalar IEEE expression written identically in both
    engines. Scale: one scan + doc_id join + one 1-row reduce."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    r1 = (
        100 * F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        > 8 * F.size(toks)
    ).cast("int")
    base = d.select("doc_id", r1.alias("r1"),
                    (F.col("n_chars") > _FLEISS_CHARS).cast("int").alias("r3"))
    clf = linear_classifier_inference(spark, sf_dir).select(
        "doc_id", (F.col("score_milli") > 0).cast("int").alias("r2")
    )
    votes = base.join(clf, "doc_id").select(
        (F.col("r1") + F.col("r2") + F.col("r3")).alias("n_pos")
    )
    s = votes.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("s1"),
        F.sum(F.col("n_pos") * F.col("n_pos")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    three_n = (3 * n).cast("double")
    p_bar = (s2 - 3 * s1 + 3 * n).cast("double") / three_n
    p1 = s1.cast("double") / three_n
    p0 = (3 * n - s1).cast("double") / three_n
    p_e = p1 * p1 + p0 * p0
    return s.select(
        n.alias("n_docs"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("fleiss_kappa"),
    )


_TXT_REG["fleiss_kappa_multirater"].oracle = _TXT_REG[
    "fleiss_kappa_multirater"
].oracle.replace(
    "{_CLF_ORACLE}", _TXT_REG["linear_classifier_inference"].oracle
)


# --- Heaps-law vocabulary growth curve (round 8) -----------------------------
@register(
    "heaps_vocab_growth_curve",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    firstb AS (
        SELECT token,
               MIN(CAST(doc_id * 10 // n.n_docs AS BIGINT)) AS first_decile
        FROM tok CROSS JOIN n GROUP BY token
    ),
    hist AS (
        SELECT first_decile, CAST(COUNT(*) AS BIGINT) AS new_types
        FROM firstb GROUP BY first_decile
    ),
    spine AS (SELECT unnest(range(0, 10)) AS d)
    SELECT d + 1 AS prefix_decile,
           CAST(d + 1 AS DOUBLE) / 10.0 AS corpus_fraction,
           CAST(coalesce(h.new_types, 0) AS BIGINT) AS new_types,
           CAST(SUM(coalesce(h.new_types, 0)) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS vocab_size
    FROM spine LEFT JOIN hist h ON h.first_decile = spine.d
    """,
    tags=("text_analysis", "heaps_law", "vocab_growth", "tokenizer",
          "bounded_window"),
)
def heaps_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct-type count at each 10%
    corpus prefix (by doc_id order) — the curve that sizes a tokenizer
    vocab and predicts how many NEW types the next 10 TB will add
    (fit V = K·n^β offline on these points; the β fit itself needs
    log, which this repo's determinism line leaves to the client).
    The classic trick makes it one pass: a type's contribution to
    every prefix is determined by its FIRST-occurrence decile, so
    vocab_size(d) = Σ_{d'<=d} new_types(d') — a groupBy-min over the
    token stream plus a cumulative sum over the gapless 10-row decile
    spine (bounded_window), never one count-distinct per prefix. Scale: one
    tokenize scan, one token-grain agg (partial-aggregated), 10-row
    tail."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count("*").alias("n_docs"))
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    firstb = (
        tok.crossJoin(F.broadcast(n))
        .groupBy("token")
        .agg(
            F.min(F.expr("doc_id * 10 div n_docs"))
            .cast("long")
            .alias("first_decile")
        )
    )
    hist = firstb.groupBy("first_decile").agg(
        F.count("*").cast("long").alias("new_types")
    )
    spine = spark.range(0, 10).select(F.col("id").alias("d"))
    dense = spine.join(
        hist, F.col("first_decile") == F.col("d"), "left"
    ).select(
        "d", F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types")
    )
    wc = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return dense.select(
        (F.col("d") + 1).alias("prefix_decile"),
        ((F.col("d") + 1).cast("double") / 10.0).alias("corpus_fraction"),
        "new_types",
        F.sum("new_types").over(wc).cast("long").alias("vocab_size"),
    )


# --- Platt scaling, one Newton step (round 8) ---------------------------------
@register(
    "platt_scaling_newton_step",
    oracle="""
    WITH b AS (
        SELECT CAST(n_chars AS BIGINT) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS ss,
               CAST(SUM(s * s) AS BIGINT) AS ss2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(s * y) AS BIGINT) AS ssy
        FROM b
    )
    SELECT n,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
           -(CAST(n AS DOUBLE) * (0.5 * ss - CAST(ssy AS DOUBLE))
             - CAST(ss AS DOUBLE) * (0.5 * n - CAST(sy AS DOUBLE)))
           / (0.25 * (CAST(ss2 AS DOUBLE) * n - CAST(ss AS DOUBLE) * ss))
               AS w1,
           -(CAST(ss2 AS DOUBLE) * (0.5 * n - CAST(sy AS DOUBLE))
             - CAST(ss AS DOUBLE) * (0.5 * ss - CAST(ssy AS DOUBLE)))
           / (0.25 * (CAST(ss2 AS DOUBLE) * n - CAST(ss AS DOUBLE) * ss))
               AS b1
    FROM agg
    """,
    tags=("calibration", "platt_scaling", "logistic", "ml_eval"),
)
def platt_scaling_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Newton/IRLS step of Platt scaling (Platt 1999): fit
    sigmoid(w·s + b) of a raw score (document length) to a binary label
    (lang='en') starting from (w,b)=(0,0). At the starting point every
    p_i = 1/2, so the gradient is [½Σs − Σys, ½n − Σy] and the Hessian
    ¼[[Σs², Σs],[Σs, n]] — FIVE integer sufficient statistics from one
    partial-aggregated scan, then a closed-form 2×2 solve. The
    parametric complement to isotonic_calibration /
    classifier_calibration_bins: those re-bin, Platt fits a sigmoid.
    No logs (the NLL objective needs them; the STEP does not — libm
    discipline), all sums exact BIGINT (n_chars² · n < 2^53 through
    sf10), fixed-order IEEE assembly. Scale: one scan, 1-row output;
    further Newton steps would each be one more scan with reweighted
    (p, p(1−p)) terms."""
    b = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    agg = b.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("ss"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ss2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("s") * F.col("y")).cast("long").alias("ssy"),
    )
    nd = F.col("n").cast("double")
    ssd = F.col("ss").cast("double")
    ss2d = F.col("ss2").cast("double")
    gw = F.lit(0.5) * F.col("ss") - F.col("ssy").cast("double")
    gb = F.lit(0.5) * F.col("n") - F.col("sy").cast("double")
    det = F.lit(0.25) * (ss2d * F.col("n") - ssd * F.col("ss"))
    return agg.select(
        "n",
        (F.col("sy").cast("double") / nd).alias("pos_rate"),
        (-(nd * gw - ssd * gb) / det).alias("w1"),
        (-(ss2d * gb - ssd * gw) / det).alias("b1"),
    )


# --- Chao1 vocabulary-richness estimate per source (round 8) ------------------
@register(
    "chao1_vocab_richness",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    tf AS (SELECT source, token, COUNT(*) AS c FROM tok
           WHERE token <> '' GROUP BY 1, 2),
    agg AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS d_observed,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM tf GROUP BY source
    )
    SELECT source, d_observed, f1, f2,
           CAST(d_observed AS DOUBLE)
             + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
               AS chao1
    FROM agg
    """,
    tags=("text", "vocabulary", "chao1", "species_richness", "corpus_stats"),
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 estimate of TRUE vocabulary size per source (Chao 1984,
    bias-corrected form): D + f₁(f₁−1)/(2(f₂+1)), where f₁/f₂ are the
    singleton/doubleton type counts. heaps_vocab_growth_curve
    extrapolates vocabulary by a power law; Chao1 answers the
    complementary curator question 'how much vocabulary have we NOT yet
    sampled from this source?' from one frequency profile — pure count
    arithmetic (no logs). Scale: tokenize-explode → two nested
    map-side-combinable groupBys ((source,token) then source); the
    explode never materializes documents, only token rows, and the
    second aggregate reduces to O(sources)."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(_tokens(F.col("text"))).alias("token")
    )
    tf = tok.filter(F.col("token") != "").groupBy("source", "token").agg(
        F.count("*").alias("c")
    )
    agg = tf.groupBy("source").agg(
        F.count("*").cast("long").alias("d_observed"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    return agg.select(
        "source", "d_observed", "f1", "f2",
        (
            F.col("d_observed").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)).cast("double")
        ).alias("chao1"),
    )


# --- Stratified k-fold assignment (round 8) ------------------------------------
KFOLD_K = 5


@register(
    "stratified_kfold_assignment",
    oracle=f"""
    WITH folded AS (
        SELECT lang,
               CAST((ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
                    % {KFOLD_K} AS INT) AS fold
        FROM documents
    ),
    cells AS (
        SELECT lang, fold, COUNT(*) AS n_docs FROM folded GROUP BY 1, 2
    ),
    spread AS (
        SELECT lang, CAST(MAX(n_docs) - MIN(n_docs) AS BIGINT) AS imbalance
        FROM cells GROUP BY lang
    )
    SELECT c.lang, c.fold, CAST(c.n_docs AS BIGINT) AS n_docs, s.imbalance
    FROM cells c JOIN spread s ON c.lang = s.lang
    """,
    tags=("ml_data", "kfold", "stratified_split", "train_eval"),
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified K-fold assignment over documents with
    language as the stratum: within each stratum, docs ordered by key
    are dealt round-robin to K folds, so every fold carries each
    language in proportion (per-stratum imbalance ≤ 1 row — emitted as
    an audit column so the guarantee is CHECKED, not assumed).
    Complements train_val_split (hash split, unstratified) and
    temporal_group_split (time-ordered): stratification is what keeps
    low-resource languages from vanishing out of a validation fold.
    The window is partitioned BY STRATUM (entity-bounded, not global);
    at 100 TB a row_number-free variant can deal by
    (dense per-stratum hash rank % K), trading the in-stratum window
    for a hash shuffle — the round-robin contract is the same."""
    folded = load_table(spark, sf_dir, "documents").select(
        "lang",
        (
            (F.row_number().over(W.partitionBy("lang").orderBy("doc_id")) - 1)
            % KFOLD_K
        ).cast("int").alias("fold"),
    )
    cells = folded.groupBy("lang", "fold").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    spread = cells.groupBy("lang").agg(
        (F.max("n_docs") - F.min("n_docs")).cast("long").alias("imbalance")
    )
    return cells.join(spread, "lang").select("lang", "fold", "n_docs", "imbalance")


# --- Matthews correlation coefficient of the lang-ID heuristic (round 8) ------
@register(
    "mcc_matthews_correlation",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    s AS (SELECT lang,
                 CAST(len(list_filter(toks, x -> x IN ({_SW_SQL}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                 CAST(len(list_filter(toks,
                          x -> x IN ('data', 'query', 'table'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) AS en_ratio
          FROM t),
    pred AS (
        SELECT lang = 'en' AS truth,
               (sw_ratio + en_ratio > 0.12) AS predicted
        FROM s
    ),
    cm AS (
        SELECT CAST(COUNT(*) FILTER (WHERE truth AND predicted) AS BIGINT)
                   AS tp,
               CAST(COUNT(*) FILTER (WHERE NOT truth AND predicted) AS BIGINT)
                   AS fp,
               CAST(COUNT(*) FILTER (WHERE truth AND NOT predicted) AS BIGINT)
                   AS fn,
               CAST(COUNT(*) FILTER (WHERE NOT truth AND NOT predicted)
                    AS BIGINT) AS tn
        FROM pred
    )
    SELECT tp, fp, fn, tn,
           CAST(tp * tn - fp * fn AS DOUBLE)
               / sqrt(CAST((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
                           AS DOUBLE)) AS mcc
    FROM cm
    """,
    tags=("text", "ml_eval", "mcc", "confusion_matrix"),
)
def mcc_matthews_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the SAME lang-ID heuristic
    classifier_eval_f1 evaluates — the balanced single-number verdict
    F1 can't give (F1 ignores true negatives; MCC is the full 2×2
    Pearson phi and stays honest under class imbalance, the normal
    state of corpus-quality classifiers). The confusion matrix comes
    from one conditional aggregate; MCC's numerator and the
    denominator's four marginal products are exact BIGINTs (sub-2^53
    through sf10 — beyond that, take the four sqrt factors separately
    before multiplying), one sqrt, one division."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    en = (
        F.size(F.filter(toks, lambda x: x.isin("data", "query", "table")))
        .cast("double")
        / n
    )
    pred = d.select(
        (F.col("lang") == "en").alias("truth"),
        ((sw + en) > 0.12).alias("predicted"),
    )
    t, p = F.col("truth"), F.col("predicted")
    cm = pred.agg(
        F.count_if(t & p).cast("long").alias("tp"),
        F.count_if(~t & p).cast("long").alias("fp"),
        F.count_if(t & ~p).cast("long").alias("fn"),
        F.count_if(~t & ~p).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp", "fp", "fn", "tn",
        (
            (tp * tn - fp * fn).cast("double")
            / F.sqrt(((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)).cast("double"))
        ).alias("mcc"),
    )


# --- Cochran's Q over three quality rules (round 8) ----------------------------
@register(
    "cochran_q_test",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
               FROM documents),
    flags AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS r1,
               CASE WHEN len(list_filter(toks, x -> x IN ({_SW_SQL}))) * 20
                         > len(toks) THEN 1 ELSE 0 END AS r2,
               CASE WHEN len(list_filter(toks,
                        x -> x IN ('data', 'query', 'table'))) * 50
                         > len(toks) THEN 1 ELSE 0 END AS r3
        FROM t
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(r1) AS BIGINT) AS c1,
               CAST(SUM(r2) AS BIGINT) AS c2,
               CAST(SUM(r3) AS BIGINT) AS c3,
               CAST(SUM(r1 + r2 + r3) AS BIGINT) AS s_r,
               CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS s_r2
        FROM flags
    )
    SELECT n_docs, c1, c2, c3,
           CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - s_r * s_r) AS DOUBLE)
               / CAST(3 * s_r - s_r2 AS DOUBLE) AS q_stat
    FROM agg
    """,
    tags=("statistics", "cochran_q", "ml_eval", "rater_agreement"),
)
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three binary quality rules applied to every
    document (length ≥ 200 chars, stopword share > 5%, en-marker share
    > 2%): do the rules flag at the same rate, or is one systematically
    stricter? The k-treatment generalization of
    mcnemar_paired_classifiers (k=2) and the binary special case of
    friedman_test — the question a filtering pipeline asks before
    OR-ing rules together. Thresholds are integer cross-multiplications
    (count·20 > n_toks — no float ratios), so every input to
    Q = (k−1)(kΣCⱼ² − N²)/(kΣRᵢ − ΣRᵢ²) is an exact BIGINT from ONE
    map-side-combinable conditional aggregate; the statistic is one
    division. Scale: single corpus scan, 1-row output."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    nt = F.size(toks)
    sw_c = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    en_c = F.size(F.filter(toks, lambda x: x.isin("data", "query", "table")))
    flags = d.select(
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("r1"),
        F.when(sw_c * 20 > nt, 1).otherwise(0).alias("r2"),
        F.when(en_c * 50 > nt, 1).otherwise(0).alias("r3"),
    )
    ri = F.col("r1") + F.col("r2") + F.col("r3")
    agg = flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("r1").cast("long").alias("c1"),
        F.sum("r2").cast("long").alias("c2"),
        F.sum("r3").cast("long").alias("c3"),
        F.sum(ri).cast("long").alias("s_r"),
        F.sum(ri * ri).cast("long").alias("s_r2"),
    )
    c1, c2, c3 = F.col("c1"), F.col("c2"), F.col("c3")
    return agg.select(
        "n_docs", "c1", "c2", "c3",
        (
            (2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - F.col("s_r") * F.col("s_r")))
            .cast("double")
            / (3 * F.col("s_r") - F.col("s_r2")).cast("double")
        ).alias("q_stat"),
    )


# --- Hoover (Robin Hood) index with between/within decomposition (round 11) --------
@register(
    "hoover_index_decomposition",
    oracle="""
    WITH d AS (
      SELECT source, CAST(n_chars AS BIGINT) AS y FROM documents),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(y) AS BIGINT) AS yg
      FROM d GROUP BY 1),
    t AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(yg) AS BIGINT) AS yy
      FROM g),
    w AS (
      SELECT d.source,
             SUM(ABS(CAST(d.y AS HUGEINT) * g.ng - g.yg)) AS wnum
      FROM d JOIN g ON g.source = d.source
      GROUP BY 1),
    b AS (
      SELECT g.source, g.ng, g.yg,
             ABS(CAST(g.yg AS HUGEINT) * t.n - CAST(g.ng AS HUGEINT) * t.yy)
                 AS bnum,
             t.n, t.yy
      FROM g, t)
    SELECT b.source,
           b.ng AS n_docs,
           b.yg AS total_chars,
           CAST(w.wnum AS DOUBLE)
             / (2.0 * CAST(b.yg AS DOUBLE) * CAST(b.ng AS DOUBLE))
               AS within_hoover,
           CAST(b.bnum AS DOUBLE)
             / (2.0 * CAST(b.yy AS DOUBLE) * CAST(b.n AS DOUBLE))
               AS between_contrib,
           (SELECT CAST(SUM(b2.bnum) AS DOUBLE) FROM b b2)
             / (2.0 * CAST(b.yy AS DOUBLE) * CAST(b.n AS DOUBLE))
               AS hoover_between
    FROM b JOIN w ON w.source = b.source
    """,
    tags=("text", "inequality", "hoover", "data_mixing", "statistics"),
)
def hoover_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of the token-budget distribution, with
    a between-source / within-source decomposition: H = half the total
    share of characters that would have to move for perfect equality —
    the most direct 'how skewed is my training mixture' number, read
    in corpus-fraction units where gini_coefficient is an area and
    atkinson_inequality_index a welfare ratio. between_contrib ranks
    the sources whose SIZE distorts the mixture (the input
    source_gini_diversity and mixture_weights act on); within_hoover
    ranks sources whose internal doc-length skew will distort
    length-bucketed packing (pack_token_budget).

    Chosen over the Theil decomposition deliberately: Theil needs
    ln() — banned cross-engine (IEEE libm ulp drift, the dsir/zipf
    discipline) — while every Hoover numerator is an exact integer
    |y_i*N_g - Y_g| (within) or |Y_g*N - N_g*Y| (between) in
    HUGEINT / DECIMAL(38,0), and each output is ONE division of exact
    integers. Magnitudes stay inside 128-bit range past 1e18 docs.

    Scale (100 TB): one corpus scan joined to the |source|-row
    broadcast of per-source scalars for the within numerators
    (map-side combinable absolute sums); everything else runs on
    |source| rows."""
    dec = "decimal(38,0)"
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("y")
    )
    g = d.groupBy("source").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("y").cast("long").alias("yg"),
    )
    t = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("yg").cast("long").alias("yy"),
    )
    w = (
        d.join(F.broadcast(g), "source")
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(
                    (F.col("y").cast(dec) * F.col("ng")).cast(dec) - F.col("yg")
                ).cast(dec)
            )
            .cast(dec)
            .alias("wnum")
        )
    )
    b = g.crossJoin(F.broadcast(t)).select(
        "source",
        "ng",
        "yg",
        "n",
        "yy",
        F.abs(
            (F.col("yg").cast(dec) * F.col("n")).cast(dec)
            - (F.col("ng").cast(dec) * F.col("yy")).cast(dec)
        )
        .cast(dec)
        .alias("bnum"),
    )
    btot = b.agg(F.sum("bnum").cast(dec).alias("bsum"))
    return (
        b.join(w, "source")
        .crossJoin(F.broadcast(btot))
        .select(
            "source",
            F.col("ng").alias("n_docs"),
            F.col("yg").alias("total_chars"),
            (
                F.col("wnum").cast("double")
                / (F.lit(2.0) * F.col("yg").cast("double") * F.col("ng").cast("double"))
            ).alias("within_hoover"),
            (
                F.col("bnum").cast("double")
                / (F.lit(2.0) * F.col("yy").cast("double") * F.col("n").cast("double"))
            ).alias("between_contrib"),
            (
                F.col("bsum").cast("double")
                / (F.lit(2.0) * F.col("yy").cast("double") * F.col("n").cast("double"))
            ).alias("hoover_between"),
        )
    )
