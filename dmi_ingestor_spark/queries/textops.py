"""Text-analysis operators over ``documents`` (SURVEY.md §2.10 U7).

Language-ID, quality scoring, token counting, and document
fingerprinting — all as Catalyst expressions (no Python in the row
path), each with a DuckDB twin. Ratios are emitted as raw exact
divisions (integer numerator/denominator), never rounded, so the
hash-match is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register

STOPWORDS = ("the", "a")
FP_MOD = 1_000_000_007
FP_BASE = 31


@register(
    "text_token_stats",
    oracle=r"""
    SELECT
      doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        AS n_tokens_bpeish,
      CAST(LENGTH(text) AS BIGINT) AS n_chars_computed,
      n_chars
    FROM documents
    """,
    doc=(
        "U7 token counting: whitespace tokens and a BPE-ish regex "
        "tokenizer (letter runs | digit runs | single punctuation) — the "
        "standard pre-tokenizer shape. Pure regexp_extract_all; "
        "validates the fixture's n_chars column on the way."
    ),
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("long")
        .alias("n_tokens_bpeish"),
        F.length("text").cast("long").alias("n_chars_computed"),
        "n_chars",
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT
        doc_id,
        lang,
        string_split(text, ' ') AS toks,
        CAST(LENGTH(text) AS DOUBLE) AS n_chars_d,
        CAST(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS n_alpha
      FROM documents
    )
    SELECT
      doc_id,
      lang,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_filter(toks, x -> x IN {STOPWORDS})) AS DOUBLE) / len(toks)
        AS stopword_ratio,
      n_alpha / n_chars_d AS alpha_ratio,
      (n_chars_d - (len(toks) - 1)) / len(toks) AS avg_token_len,
      CASE WHEN len(toks) >= 20
            AND n_alpha / n_chars_d > 0.5
            AND CAST(len(list_filter(toks, x -> x IN {STOPWORDS})) AS DOUBLE)
                / len(toks) < 0.5
           THEN 1 ELSE 0 END AS quality_keep
    FROM t
    """,
    doc=(
        "U7 quality scoring: stopword ratio, alphabetic ratio, mean token "
        "length, and a keep/drop gate — the Gopher/C4-style heuristic "
        "filter family, as pure column expressions."
    ),
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    n_chars = F.length("text").cast("double")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double")
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n_toks
    )
    alpha_ratio = n_alpha / n_chars
    avg_tok = (n_chars - (n_toks - 1)) / n_toks
    keep = (
        F.when((n_toks >= 20) & (alpha_ratio > 0.5) & (stop_ratio < 0.5), 1)
        .otherwise(0)
        .cast("int")
    )
    return d.select(
        "doc_id",
        "lang",
        n_toks.cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        avg_tok.alias("avg_token_len"),
        keep.alias("quality_keep"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT
      doc_id,
      list_reduce(
        list_prepend(
          CAST(0 AS BIGINT),
          list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))
        ),
        (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
      ) AS fingerprint
    FROM documents
    """,
    doc=(
        "U7 document fingerprint: polynomial rolling hash over characters "
        "(base 31 mod 1e9+7), the Rabin-Karp family. One aggregate() "
        "fold, exact 64-bit integer arithmetic both engines. Content-"
        "defined chunking at scale reuses the same fold per window."
    ),
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.split(F.col("text"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# Language ID: n-gram/function-word profile voting.
# --------------------------------------------------------------------------

# (token, lang, weight) — tiny function-word profiles. The synthetic
# corpus is English word salad for every `lang` label (no real signal),
# so most docs resolve to 'en' or the 'und' fallback — the operator
# demonstrates and tests the *mechanism*; real profiles drop in as data.
LANG_PROFILES: tuple[tuple[str, str, int], ...] = (
    ("the", "en", 2),
    ("a", "en", 1),
    ("le", "fr", 2),
    ("la", "fr", 2),
    ("der", "de", 2),
    ("die", "de", 2),
    ("el", "es", 2),
    ("los", "es", 2),
    ("de", "es", 1),
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    profiles(token, plang, weight) AS (
      VALUES {", ".join(f"('{t}', '{lg}', {w})" for t, lg, w in LANG_PROFILES)}
    ),
    scores AS (
      SELECT t.doc_id, p.plang, SUM(p.weight) AS score
      FROM toks t JOIN profiles p ON t.token = p.token
      GROUP BY t.doc_id, p.plang
    ),
    best AS (
      SELECT doc_id, plang, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, plang
             ) AS rn
      FROM scores
    )
    SELECT
      d.doc_id,
      d.lang AS labeled_lang,
      COALESCE(b.plang, 'und') AS detected_lang,
      CAST(COALESCE(b.score, 0) AS BIGINT) AS score
    FROM documents d
    LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """,
    doc=(
        "U7 language ID: function-word profile voting — explode tokens, "
        "broadcast-join the profile table, argmax score per doc "
        "(deterministic tiebreak), 'und' fallback. The standard "
        "n-gram-profile approach with the profile table as data."
    ),
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    profiles = F.broadcast(
        d.sparkSession.createDataFrame(
            list(LANG_PROFILES), schema="token string, plang string, weight long"
        )
    )
    scores = (
        toks.join(profiles, "token")
        .groupBy("doc_id", "plang")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("plang"))
    best = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        d.select("doc_id", F.col("lang").alias("labeled_lang"))
        .join(best.select("doc_id", "plang", "score"), "doc_id", "left")
        .select(
            "doc_id",
            "labeled_lang",
            F.coalesce(F.col("plang"), F.lit("und")).alias("detected_lang"),
            F.coalesce(F.col("score"), F.lit(0)).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# TF-IDF (ratio form): tf × N / df. No logarithm — libm ulps differ across
# engines, while integer-ratio division of identical ints is bit-exact —
# and rank order per document is identical to the log form for fixed N.
# --------------------------------------------------------------------------

TFIDF_TOP = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 50
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok <> '' GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      WHERE tok <> '' GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id ORDER BY
                 CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df DESC,
                 tf.tok
             ) AS rk
      FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, tok, tf, df, score, rk
    FROM scored WHERE rk <= {TFIDF_TOP}
    """,
    doc=(
        "U7 TF-IDF: term frequency × N/df (ratio form, log-free for "
        "cross-engine bit-exactness), top-3 terms per document. Scale: "
        "tf and df are partial-aggregated token-count shuffles; the df "
        "side is vocabulary-sized and joins the tf side on the token key."
    ),
    tags=("text", "aggregation", "window"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks_all = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = (
        toks_all.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = toks_all.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, ["tok"])
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf").cast("double") * F.col("n_docs") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", "tok", "tf", "df", "score", "rk")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split — md5(doc_id) compared against hex
# thresholds. Hash-based assignment is the standard way to split training
# corpora at 100 TB: no shuffle, no global sort, no RNG state; every
# executor assigns rows independently and the split is stable across
# reruns and engines (Spark and DuckDB emit identical lowercase-hex md5).
# --------------------------------------------------------------------------

SPLIT_TRAIN_LT = "cc"  # ~79.7% of the uniform hex space
SPLIT_VAL_LT = "e6"  # next ~10.2%; remainder is test


@register(
    "text_hash_split",
    oracle=f"""
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
      SELECT lang, n_chars,
             CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_TRAIN_LT}'
                    THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_VAL_LT}'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc=(
        "Deterministic hash-based train/val/test corpus split "
        "(md5 hex-range assignment), counts per (split, lang). "
        "Embarrassingly parallel: the assignment is a narrow projection; "
        "the only shuffle is the final small aggregate."
    ),
    tags=("text", "training-pipeline", "sampling"),
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < SPLIT_TRAIN_LT, "train")
        .when(h < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, t.tok
      FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    )
    SELECT
      tok AS token,
      CAST(COUNT(*) AS BIGINT) AS doc_freq,
      array_to_string(
        list_transform(list(doc_id ORDER BY doc_id)[1:20],
                       x -> CAST(x AS VARCHAR)), ',') AS postings_head
    FROM tok
    GROUP BY tok
    """,
    doc=(
        "U7/IR: inverted-index build — token -> document frequency + the "
        "first 20 postings (sorted doc ids, serialized to a string so the "
        "driver canonicalizer can hash it). Distinct-per-doc explode, one "
        "shuffle on token; the postings head is capped so a hot token "
        "(stopword) cannot blow up a group. At 100 TB the same plan holds "
        "with a df-cap filter before collect_set; skew on hot tokens is "
        "bounded by the slice."
    ),
    tags=("text", "index"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_head"),
    )


@register(
    "text_bigram_lm",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), big AS (
      SELECT b.pair[1] AS tok, b.pair[2] AS nxt
      FROM w, unnest(list_zip(ws[1:len(ws)-1], ws[2:])) AS b(pair)
    ), cnt AS (
      SELECT tok, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM big GROUP BY tok, nxt
    ), tot AS (
      SELECT tok, SUM(n) AS tot_n FROM cnt GROUP BY tok
    )
    SELECT
      c.tok,
      c.nxt,
      c.n,
      CAST((c.n * 1000) // t.tot_n AS BIGINT) AS permille
    FROM cnt c JOIN tot t USING (tok)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c.tok ORDER BY c.n DESC, c.nxt) <= 3
    """,
    doc=(
        "U7: bigram language-model counts — per token, the top-3 next "
        "tokens with integer permille conditional probability. Bigrams "
        "come from a zero-shuffle zip of the token array with its own "
        "tail (transform over sequence), then one groupBy(tok, nxt); the "
        "per-token total reuses the pair aggregate (partial sums, no "
        "second scan). Integer permille (floor div) keeps the hash exact."
    ),
    tags=("text", "lm"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    big = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> struct(split(text, ' ')[i - 1] AS tok,"
                "             split(text, ' ')[i] AS nxt))"
            )
        ).alias("p")
    ).select("p.tok", "p.nxt")
    cnt = big.groupBy("tok", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wt = Window.partitionBy("tok")
    wr = Window.partitionBy("tok").orderBy(F.col("n").desc(), "nxt")
    return (
        cnt.withColumn("tot_n", F.sum("n").over(wt))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            "tok",
            "nxt",
            "n",
            ((F.col("n") * 1000) / F.col("tot_n")).cast("long").alias("permille"),
        )
    )


@register(
    "text_lm_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), big AS (
      SELECT doc_id, b.pair[1] AS tok, b.pair[2] AS nxt
      FROM w, unnest(list_zip(ws[1:len(ws)-1], ws[2:])) AS b(pair)
    ), cnt AS (
      SELECT tok, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM big GROUP BY tok, nxt
    ), tot AS (
      SELECT tok, SUM(n) AS tot_n FROM cnt GROUP BY tok
    ), lm AS (
      SELECT c.tok, c.nxt, CAST((c.n * 1000) // t.tot_n AS BIGINT) AS permille
      FROM cnt c JOIN tot t USING (tok)
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lm.permille) AS BIGINT) AS sum_permille,
           CAST(SUM(lm.permille) // COUNT(*) AS BIGINT) AS avg_permille
    FROM big b JOIN lm ON b.tok = lm.tok AND b.nxt = lm.nxt
    GROUP BY b.doc_id
    """,
    doc=(
        "Model-apply scoring — the quality-filter stage that closes the "
        "text_bigram_lm loop: every document is scored by the mean "
        "integer-permille conditional probability of its bigrams under "
        "the corpus bigram LM. The LM (vocab² bounded) broadcasts, so "
        "the corpus-side bigram stream never shuffles for the join — "
        "the exact shape of applying ANY small learned artifact "
        "(n-gram LM, quality classifier weights, stop-list) to a "
        "100 TB corpus: train small, broadcast, score map-side, one "
        "doc_id aggregate. All-integer permille arithmetic keeps "
        "train AND apply hash-exact."
    ),
    tags=("text", "lm", "training-pipeline"),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    big = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> struct(split(text, ' ')[i - 1] AS tok,"
                "             split(text, ' ')[i] AS nxt))"
            )
        ).alias("p"),
    ).select("doc_id", "p.tok", "p.nxt")
    cnt = big.groupBy("tok", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("tok").agg(F.sum("n").alias("tot_n"))
    lm = cnt.join(tot, "tok").select(
        "tok", "nxt", ((F.col("n") * 1000) / F.col("tot_n")).cast("long").alias("permille")
    )
    return (
        big.join(F.broadcast(lm), ["tok", "nxt"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("permille").cast("long").alias("sum_permille"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_permille",
            (F.col("sum_permille") / F.col("n_bigrams")).cast("long").alias("avg_permille"),
        )
    )


# --------------------------------------------------------------------------
# BPE-style merge training: the tokenizer-learning loop as a lazy plan.
# --------------------------------------------------------------------------

_BPE_K = 4  # merge rounds


def _bpe_oracle() -> str:
    """Unrolled K-round merge training as a MATERIALIZED CTE chain."""
    sep = "chr(3) || chr(2)"  # token boundary: ...tok<3><2>tok...
    parts = [
        f"""
    WITH d0 AS MATERIALIZED (
      SELECT doc_id,
             chr(2) || array_to_string(string_split(text, ' '), {sep}) || chr(3)
               AS doc
      FROM documents
    )"""
    ]
    for k in range(_BPE_K):
        parts.append(
            f""", tk{k} AS (
      SELECT string_split(substr(doc, 2, length(doc) - 2), {sep}) AS toks
      FROM d{k}
    ), px{k} AS (
      SELECT toks, unnest(range(len(toks) - 1)) AS i FROM tk{k}
    ), p{k} AS MATERIALIZED (
      SELECT toks[CAST(i + 1 AS INTEGER)] AS a,
             toks[CAST(i + 2 AS INTEGER)] AS b,
             CAST(COUNT(*) AS BIGINT) AS pair_count
      FROM px{k} GROUP BY a, b
    ), best{k} AS MATERIALIZED (
      SELECT a, b, pair_count FROM p{k}
      ORDER BY pair_count DESC, a, b LIMIT 1
    ), d{k + 1} AS MATERIALIZED (
      SELECT d.doc_id,
             replace(d.doc,
                     chr(2) || w.a || chr(3) || chr(2) || w.b || chr(3),
                     chr(2) || w.a || '_' || w.b || chr(3)) AS doc
      FROM d{k} d CROSS JOIN best{k} w
    )"""
        )
    sel = "\n    UNION ALL ".join(
        f"SELECT {k + 1} AS merge_rank, a, b, pair_count FROM best{k}"
        for k in range(_BPE_K)
    )
    parts.append(f"\n    {sel}")
    return "".join(parts)


_BPE_SEP = "\x03\x02"


def _bpe_loop(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """K rounds of merge learning; returns (per-round argmax rows, final docs)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("\x02"),
            F.array_join(F.split(F.col("text"), " "), _BPE_SEP),
            F.lit("\x03"),
        ).alias("doc"),
    )

    def pair_counts(d: DataFrame) -> DataFrame:
        inner = F.col("doc").substr(F.lit(2), F.length("doc") - 2)
        toks = F.split(inner, _BPE_SEP)
        idx = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        return (
            d.select(toks.alias("toks"), F.explode(idx).alias("i"))
            .select(
                F.element_at("toks", F.col("i")).alias("a"),
                F.element_at("toks", F.col("i") + 1).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        )

    bests: list[DataFrame] = []
    d = docs
    for _ in range(_BPE_K):
        best = (
            pair_counts(d)
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .cache()  # consumed by the output union AND the next rewrite
        )
        bests.append(best)
        d = (
            d.crossJoin(F.broadcast(best))
            .select(
                "doc_id",
                F.replace(
                    F.col("doc"),
                    F.concat(
                        F.lit("\x02"), F.col("a"), F.lit("\x03"),
                        F.lit("\x02"), F.col("b"), F.lit("\x03"),
                    ),
                    F.concat(
                        F.lit("\x02"), F.col("a"), F.lit("_"), F.col("b"),
                        F.lit("\x03"),
                    ),
                ).alias("doc"),
            )
            .cache()  # each round's corpus feeds the next round's count
        )
    return bests, d


def _bpe_apply_oracle() -> str:
    """Same K-round chain, but emitting per-doc token counts after apply."""
    chain = _bpe_oracle()
    cut = chain.rindex("\n    SELECT 1 AS merge_rank")
    chain = chain[:cut]
    sep = "chr(3) || chr(2)"
    return (
        chain
        + f"""
    SELECT d.doc_id,
           CAST(len(string_split(orig.text, ' ')) AS BIGINT) AS n_before,
           CAST(len(string_split(substr(d.doc, 2, length(d.doc) - 2),
                                 {sep})) AS BIGINT) AS n_after
    FROM d{_BPE_K} d JOIN documents orig ON orig.doc_id = d.doc_id
    """
    )


@register(
    "text_bpe_merges",
    oracle=_bpe_oracle(),
    doc=(
        "Tokenizer training as a distributed job: K rounds of BPE-style "
        "merge learning over the word alphabet — each round counts "
        "adjacent token pairs corpus-wide, picks the argmax pair "
        "(count desc, lexicographic tie-break), and rewrites every "
        "document with the merged token. Documents are carried as "
        "sentinel-delimited strings (chr(2) tok chr(3)) so the merge is "
        "one JVM replace() — both engines scan left-to-right non-"
        "overlapping, which IS greedy BPE application. Per round: one "
        "pair-count shuffle + a 1-row TakeOrdered + a broadcast cross "
        "join; the corpus itself never shuffles and the whole K-round "
        "loop is ONE lazy plan (cached per round — at 100 TB each round "
        "checkpoints the rewritten corpus instead). The learned merge "
        "table, counts included, is hash-green against the unrolled "
        "CTE-chain oracle — an ITERATIVE text algorithm with exact "
        "cross-engine parity, like cluster_kmeans/pagerank."
    ),
    tags=("text", "tokenizer", "iterative", "scale"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    bests, _ = _bpe_loop(spark, sf_dir)
    out = None
    for k, best in enumerate(bests):
        row = best.select(
            F.lit(k + 1).alias("merge_rank"), "a", "b", "pair_count"
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "text_bpe_apply",
    oracle=_bpe_apply_oracle(),
    doc=(
        "Tokenizer INFERENCE closing text_bpe_merges' loop: the learned "
        "merge table is applied to every document (K chained broadcast "
        "rewrites — in production the merges are a plan-time literal "
        "list, making this stage pure map-side) and per-doc token "
        "counts before/after come out. Compression is visible as "
        "n_after < n_before exactly where merges hit. Same lazy "
        "K-round plan as training; the final join back to the source "
        "table is on the narrow doc_id key."
    ),
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, d_final = _bpe_loop(spark, sf_dir)
    orig = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_before")
    )
    inner = F.col("doc").substr(F.lit(2), F.length("doc") - 2)
    after = d_final.select(
        "doc_id",
        F.size(F.split(inner, _BPE_SEP)).cast("long").alias("n_after"),
    )
    return after.join(orig, ["doc_id"]).select("doc_id", "n_before", "n_after")


# --------------------------------------------------------------------------
# Compression-ratio quality filter (Arrow-batched Python path)
# --------------------------------------------------------------------------

CR_LEVEL = 6  # zlib level — fixed so results are reproducible run-to-run
CR_KEEP_MAX_PERMILLE = 900  # keep docs with compressed/raw < 0.9


@register(
    "text_compression_ratio",
    oracle=None,  # zlib is not expressible in SQL; invariants in tests
    doc=(
        "Gopher-style compression-ratio quality signal: docs whose "
        "zlib-compressed size is a large fraction of the raw size are "
        "high-entropy (random junk), tiny fractions are degenerate "
        "repetition — both filter targets for LLM corpora. Runs as "
        "mapInPandas (Arrow batches, one zlib call per doc inside a "
        "vectorized loop — no JVM round-trips), emitting integer byte "
        "sizes and permille so downstream thresholds are exact. "
        "Rows-only by necessity (no SQL zlib); determinism (same bytes "
        "→ same sizes) and the dup-doc invariance are pinned in "
        "tests/test_invariants.py."
    ),
    tags=("text", "training-pipeline", "pandas", "rows-only"),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import zlib

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, CR_LEVEL))).astype(
                "int64"
            )
            permille = (n_comp * 1000 // n_raw).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw": n_raw,
                    "n_compressed": n_comp,
                    "ratio_permille": permille,
                    "keep": (permille < CR_KEEP_MAX_PERMILLE).astype("int32"),
                }
            )

    return d.mapInPandas(
        score,
        "doc_id long, n_raw long, n_compressed long, ratio_permille long, keep int",
    )


# --------------------------------------------------------------------------
# Model-eval harness: confusion matrix + per-class metrics for lang-id
# --------------------------------------------------------------------------

# The predictions CTE is the text_lang_id oracle verbatim — the eval is
# a composition on the SAME definition both engines already agree on.
_LANG_EVAL_ORACLE = None  # assigned below once text_lang_id is registered


def _lang_eval_sql() -> str:
    from dmi_ingestor_spark.registry import REGISTRY

    pairs = REGISTRY["text_lang_id"].oracle
    return f"""
    WITH pairs AS ({pairs}),
    conf AS (
      SELECT labeled_lang AS l, detected_lang AS p, COUNT(*) AS n
      FROM pairs GROUP BY labeled_lang, detected_lang
    ),
    lt AS (SELECT l, SUM(n) AS n_labeled FROM conf GROUP BY l),
    pt AS (SELECT p, SUM(n) AS n_predicted FROM conf GROUP BY p)
    SELECT lt.l AS lang,
           CAST(COALESCE(diag.n, 0) AS BIGINT) AS tp,
           CAST(lt.n_labeled AS BIGINT) AS n_labeled,
           CAST(COALESCE(pt.n_predicted, 0) AS BIGINT) AS n_predicted,
           CAST(CASE WHEN COALESCE(pt.n_predicted, 0) = 0 THEN 0
                     ELSE COALESCE(diag.n, 0) * 1000 // pt.n_predicted END
                AS BIGINT) AS precision_pm,
           CAST(COALESCE(diag.n, 0) * 1000 // lt.n_labeled AS BIGINT)
             AS recall_pm,
           CAST(CASE WHEN lt.n_labeled + COALESCE(pt.n_predicted, 0) = 0 THEN 0
                     ELSE COALESCE(diag.n, 0) * 2000
                          // (lt.n_labeled + COALESCE(pt.n_predicted, 0)) END
                AS BIGINT) AS f1_pm
    FROM lt
    LEFT JOIN (SELECT l, n FROM conf WHERE l = p) diag ON diag.l = lt.l
    LEFT JOIN pt ON pt.p = lt.l
    """


@register(
    "ml_eval_confusion_lang_id",
    oracle=None,  # replaced right after registration (needs text_lang_id)
    doc=(
        "Model evaluation as a first-class distributed op: the engine's "
        "own lang-id heuristic scored against the fixture's ground-truth "
        "labels — confusion matrix → per-class TP / support / predicted "
        "counts → integer-permille precision, recall and F1 "
        "(F1 = 2·tp/(support+predicted), exact in integers — no float "
        "metric drift). Composition: the predictions relation is the "
        "text_lang_id definition VERBATIM (same CTE both engines), the "
        "matrix is one O(classes²) aggregate over the per-doc pairs, "
        "metrics are class-grain joins — eval cost at 100 TB is the "
        "prediction pass, the scoring is free. The eval-inside-the-"
        "pipeline shape every training-data loop needs (did the filter "
        "change move F1?)."
    ),
    tags=("ml", "text", "eval"),
)
def ml_eval_confusion_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = text_lang_id(spark, sf_dir).select("labeled_lang", "detected_lang")
    conf = pairs.groupBy(
        F.col("labeled_lang").alias("l"), F.col("detected_lang").alias("p")
    ).agg(F.count(F.lit(1)).alias("n"))
    conf = conf.cache()  # three branches below: diag, label & pred totals
    lt = conf.groupBy("l").agg(F.sum("n").alias("n_labeled"))
    pt = conf.groupBy("p").agg(F.sum("n").alias("n_predicted"))
    diag = conf.where(F.col("l") == F.col("p")).select("l", F.col("n").alias("tp0"))
    j = (
        lt.join(diag, "l", "left")
        .join(pt, lt.l == pt.p, "left")
        .select(
            F.col("l").alias("lang"),
            F.coalesce(F.col("tp0"), F.lit(0)).cast("long").alias("tp"),
            F.col("n_labeled").cast("long").alias("n_labeled"),
            F.coalesce(F.col("n_predicted"), F.lit(0)).cast("long").alias(
                "n_predicted"
            ),
        )
    )
    tp, nl, np_ = F.col("tp"), F.col("n_labeled"), F.col("n_predicted")
    return j.select(
        "lang",
        "tp",
        "n_labeled",
        "n_predicted",
        F.when(np_ == 0, 0)
        .otherwise(F.floor(tp * 1000 / np_))
        .cast("long")
        .alias("precision_pm"),
        F.floor(tp * 1000 / nl).cast("long").alias("recall_pm"),
        F.when(nl + np_ == 0, 0)
        .otherwise(F.floor(tp * 2000 / (nl + np_)))
        .cast("long")
        .alias("f1_pm"),
    )


# Late-bind the oracle now that text_lang_id's SQL is registered.
from dmi_ingestor_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["ml_eval_confusion_lang_id"] = _REG["ml_eval_confusion_lang_id"].__class__(
    name="ml_eval_confusion_lang_id",
    builder=_REG["ml_eval_confusion_lang_id"].builder,
    oracle=_lang_eval_sql(),
    doc=_REG["ml_eval_confusion_lang_id"].doc,
    tags=_REG["ml_eval_confusion_lang_id"].tags,
)


# ---------------------------------------------------------------------------
# Arrow-native text stats (mapInArrow: pyarrow.compute kernels, no pandas)
# ---------------------------------------------------------------------------


@register(
    "text_arrow_native_stats",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) AS BIGINT)
             AS n_spaces
    FROM documents
    """,
    doc=(
        "The Arrow-NATIVE Python path: `mapInArrow` hands each "
        "partition as pyarrow RecordBatches and the per-doc stats "
        "(utf8 byte length, codepoint length, space count) are "
        "computed with pyarrow.compute kernels — vectorized C++, "
        "zero pandas conversion, zero per-row Python. This is the "
        "lowest-overhead custom-op escape hatch when even a pandas "
        "UDF's DataFrame materialization is too much; plan is a "
        "single map-side ArrowEvalPython-free MapInArrow node "
        "(no Exchange). Hash-green against DuckDB's "
        "strlen/LENGTH/replace algebra."
    ),
    tags=("text", "arrow", "documents", "udf"),
)
def text_arrow_native_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stats(batches):
        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_spaces"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _stats, schema="doc_id long, n_bytes long, n_chars long, n_spaces long"
    )


# ---------------------------------------------------------------------------
# Boilerplate stripping: drop corpus-frequent sentences, rebuild docs
# ---------------------------------------------------------------------------

BP_MAX_DF = 5  # a sentence in more than 5 docs is boilerplate


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH sent AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS sentence
      FROM (SELECT doc_id, string_split(text, '. ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)
      WHERE t[i] <> ''
    ),
    df AS (
      SELECT sentence, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sent GROUP BY sentence
    ),
    kept AS (
      SELECT s.doc_id, s.pos, s.sentence
      FROM sent s JOIN df ON s.sentence = df.sentence
      WHERE df.n_docs <= {BP_MAX_DF}
    )
    SELECT s.doc_id,
           CAST(COUNT(k.pos) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - COUNT(k.pos) AS BIGINT) AS n_dropped,
           md5(COALESCE(string_agg(k.sentence, '. ' ORDER BY k.pos), ''))
             AS rebuilt_md5
    FROM sent s
    LEFT JOIN kept k ON s.doc_id = k.doc_id AND s.pos = k.pos
    GROUP BY s.doc_id
    """,
    doc=(
        "Boilerplate removal with document RECONSTRUCTION (the "
        "C4/RefinedWeb cleanup the paragraph-dedup rewrite doesn't "
        "do): sentences whose document frequency exceeds a threshold "
        "(cookie banners, nav text) are stripped from every document, "
        "and each doc is rebuilt from its surviving sentences in "
        "original order — checksummed so the rebuild itself is "
        "hash-checked. Shape: posexplode -> sentence-grain df "
        "aggregate -> keep-filter join -> ordered collect_list "
        "reassembly; the df relation is bounded by distinct sentences "
        "and the frequent ones it drops are exactly the skew-heavy "
        "keys, so the rebuild join gets LIGHTER as boilerplate grows."
    ),
    tags=("text", "training-pipeline", "boilerplate", "documents"),
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sent = (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", "\\. ")).alias("pos0", "sentence"),
        )
        .where(F.col("sentence") != "")
        .select(
            "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "sentence"
        )
    )
    df_rel = sent.groupBy("sentence").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    kept = (
        sent.join(df_rel.where(F.col("n_docs") <= BP_MAX_DF), "sentence")
        .select("doc_id", "pos", "sentence")
    )
    k = kept.select(
        F.col("doc_id").alias("kdoc"),
        F.col("pos").alias("kpos"),
        F.col("sentence").alias("ksent"),
    )
    joined = sent.join(
        k,
        (F.col("doc_id") == F.col("kdoc")) & (F.col("pos") == F.col("kpos")),
        "left",
    )
    rebuilt = F.md5(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kpos").isNotNull(),
                                F.struct("kpos", "ksent"),
                            )
                        )
                    ),
                    lambda s: s.ksent,
                ),
                ". ",
            ),
            F.lit(""),
        ).cast("binary")
    )
    return joined.groupBy("doc_id").agg(
        F.count("kpos").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.count("kpos")).cast("long").alias("n_dropped"),
        rebuilt.alias("rebuilt_md5"),
    )


# ---------------------------------------------------------------------------
# Corpus novelty rate (first-occurrence n-gram fraction per document)
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t) - 2)) AS u(i)
    ),
    first_seen AS (
      SELECT gram, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END) AS BIGINT)
             AS n_novel,
           CAST(1000 * COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END)
                // COUNT(*) AS BIGINT) AS novelty_permille
    FROM grams g JOIN first_seen f ON g.gram = f.gram
    GROUP BY g.doc_id
    """,
    doc=(
        "Corpus novelty curve: per document (in ingestion order), the "
        "fraction of its 3-grams never seen in any earlier document — "
        "the crawl-health signal that says when a source has gone "
        "stale (novelty decays toward zero as a crawl saturates) and "
        "the aggregate cousin of the dedup ladder. First occurrence "
        "is a gram-grain min(doc_id) aggregate joined back to the "
        "gram stream — two shuffles on the gram key, no growing "
        "state, no sequential scan; 'earlier' is the stable doc_id "
        "order so the metric is deterministic and incremental "
        "(appending docs never changes old rows' novelty)."
    ),
    tags=("text", "training-pipeline", "novelty", "documents"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # guard: Spark sequence() runs DOWNWARD when start > stop, so docs
    # with <3 tokens would fabricate grams — DuckDB generate_series is
    # empty there; filter keeps the engines aligned
    toks = d.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 3
    )
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("gram").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    j = grams.join(first_seen, "gram")
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.floor(1000 * novel / F.count(F.lit(1)))
            .cast("long")
            .alias("novelty_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Contact extraction (email/handle harvesting with validation flags)
# ---------------------------------------------------------------------------


@register(
    "text_contact_extraction",
    oracle="""
    WITH enriched AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '@example.com'
                     WHEN doc_id % 3 = 1 THEN '@site.org'
                     ELSE '-at-nowhere' END AS body
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(body, '[a-z0-9]+@[a-z]+\\.[a-z]+', 0) AS email,
           CAST(CASE WHEN regexp_matches(body, '[a-z0-9]+@[a-z]+\\.[a-z]+')
                THEN 1 ELSE 0 END AS BIGINT) AS has_email,
           CAST(len(regexp_extract_all(body, '@[a-z]+')) AS BIGINT)
             AS n_at_tokens
    FROM enriched
    """,
    doc=(
        "Contact harvesting — the extraction half of PII handling "
        "(text_pii_scrub is the redaction half): find the first "
        "email-shaped token, flag documents that contain one, count "
        "@-handles. Every third doc deliberately carries a non-email "
        "'-at-' form to prove the regex doesn't over-match. The "
        "pattern stays in the Java/RE2 common subset so both engines "
        "compile it identically; pure scan-stage regexp."
    ),
    tags=("text", "pii", "extraction", "documents"),
)
def text_contact_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, "@example.com")
        .when(F.col("doc_id") % 3 == 1, "@site.org")
        .otherwise("-at-nowhere"),
    )
    pat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    e = d.select("doc_id", body.alias("body"))
    return e.select(
        "doc_id",
        F.regexp_extract("body", pat, 0).alias("email"),
        F.when(F.regexp_extract("body", pat, 0) != "", 1)
        .otherwise(0)
        .cast("long")
        .alias("has_email"),
        F.size(F.regexp_extract_all(F.col("body"), F.lit("@[a-z]+"), 0))
        .cast("long")
        .alias("n_at_tokens"),
    )


# ---------------------------------------------------------------------------
# Token co-occurrence + PMI ratios (word-association mining)
# ---------------------------------------------------------------------------


@register(
    "text_cooccurrence_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, i, t[CAST(i AS INTEGER)] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)
    ),
    pairs AS (
      SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS nxy
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.i > a.i AND b.i <= a.i + 3
       AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    ),
    uni AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n_tok FROM toks)
    SELECT p.w1, p.w2, CAST(p.nxy AS BIGINT) AS nxy,
           CAST(u1.n AS BIGINT) AS nx, CAST(u2.n AS BIGINT) AS ny,
           CAST((1000000 * p.nxy * t.n_tok) // (u1.n * u2.n) AS BIGINT)
             AS pmi_ratio_micro
    FROM pairs p
    JOIN uni u1 ON u1.tok = p.w1
    JOIN uni u2 ON u2.tok = p.w2
    CROSS JOIN tot t
    ORDER BY pmi_ratio_micro DESC, w1, w2
    LIMIT 50
    """,
    doc=(
        "Word-association mining: skip-gram co-occurrence (window 3, "
        "ordered pairs canonicalized w1<w2) with the PMI RATIO "
        "n(x,y)*N / (n(x)*n(y)) as an exact integer micro-ratio — the "
        "log-free form of pointwise mutual information (log is "
        "monotone, so the top-k by ratio IS the top-k by PMI, and "
        "avoiding ln keeps the value cross-engine exact). The "
        "collocation/phrase-mining primitive behind word2vec-style "
        "negative sampling tables and phrase detection. Positional "
        "self-join within documents only (b.i-a.i <= 3) — the blowup "
        "is window-bounded per token, shuffles key on doc_id then the "
        "pair, unigram counts broadcast back. Top-50 = TakeOrdered."
    ),
    tags=("text", "cooccurrence"),
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "tok"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    a = toks.select("doc_id", F.col("i").alias("ai"), F.col("tok").alias("w1"))
    b = toks.select("doc_id", F.col("i").alias("bi"), F.col("tok").alias("w2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(
            (F.col("bi") > F.col("ai"))
            & (F.col("bi") <= F.col("ai") + 3)
            & (F.col("w1") < F.col("w2"))
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nxy"))
        .filter(F.col("nxy") >= 5)
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    joined = (
        pairs.join(uni.select(F.col("tok").alias("w1"), F.col("n").alias("nx")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("n").alias("ny")), "w2")
        .crossJoin(F.broadcast(tot))
    )
    return (
        joined.select(
            "w1",
            "w2",
            F.col("nxy").cast("long").alias("nxy"),
            F.col("nx").cast("long").alias("nx"),
            F.col("ny").cast("long").alias("ny"),
            # integral `div`, not float `/`: num = 1e6*nxy*n_tok exceeds
            # 2^53 at sf1 (n_tok ~ 3e7), where float division goes
            # off-by-one vs DuckDB's exact BIGINT `//` (caught by the
            # r9 sf1 sweep: 4/50 rows off by 1 ulp-of-int)
            F.expr(
                "(CAST(1000000 AS BIGINT) * nxy * n_tok) div (nx * ny)"
            ).alias("pmi_ratio_micro"),
        )
        .orderBy(F.desc("pmi_ratio_micro"), "w1", "w2")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Zipf consistency: freq x rank products over the frequency table
# --------------------------------------------------------------------------

_ZIPF_S = 10**6
_ZIPF_TOPK = 20


@register(
    "text_zipf_consistency",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS f FROM toks GROUP BY token),
    tot AS (SELECT SUM(f) AS n FROM freq),
    ranked AS (
      SELECT token, f,
             ROW_NUMBER() OVER (ORDER BY f DESC, token) AS r
      FROM freq
    )
    SELECT r AS rank, token, CAST(f AS BIGINT) AS freq,
           CAST(f * r AS BIGINT) AS freq_rank_product,
           CAST((f * r * {_ZIPF_S}) // t.n AS BIGINT) AS zipf_c_scaled
    FROM ranked CROSS JOIN tot t
    WHERE r <= {_ZIPF_TOPK}
    ORDER BY r
    """,
    doc=(
        "Zipf-law consistency audit of the corpus token distribution: "
        "under Zipf, frequency x rank is roughly constant, so the "
        "top-20 products (and their total-normalized scaled form) ARE "
        "the diagnostic — flat products = natural language, a cliff "
        "= templated/generated text. All integers, deterministic "
        "(f desc, token) tiebreak; the corpus-health cousin of "
        "text_ngram_novelty. Rank over the token-grain frequency "
        "table (vocabulary-sized, the same bounded relation "
        "ml_chi2_feature_selection ranks); token counting is the "
        "one corpus-wide aggregate."
    ),
    tags=("text", "quality", "documents"),
)
def text_zipf_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    tot = freq.agg(F.sum("f").alias("n"))
    ranked = freq.select(
        "token",
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("token")))
        .alias("r"),
    ).filter(F.col("r") <= _ZIPF_TOPK)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("r").alias("rank"),
            "token",
            F.col("f").cast("long").alias("freq"),
            (F.col("f") * F.col("r")).cast("long").alias("freq_rank_product"),
            F.expr(f"(f * r * {_ZIPF_S}) div n")
            .cast("long")
            .alias("zipf_c_scaled"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# BM25 term weighting (Okapi BM25, all-integer rational form)
# ---------------------------------------------------------------------------

# k1 = 1.2 = 6/5, b = 0.75 = 3/4. The per-term normalizer
#   tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# with avgdl = L/N (L = corpus token count) clears denominators to the
# pure-integer ratio 44*tf*L / (20*tf*L + 6*L + 18*dl*N), and the IDF
# (N - df + 0.5)/(df + 0.5) clears to (2N - 2df + 1)/(2df + 1) — both
# log-free rationals pinned as scaled integers, so BM25 weights are
# hash-exact across engines (the float/log form never is). Intermediates
# ride in 128-bit (DECIMAL(38,0) / HUGEINT): 44*tf*L*S is ~9e18 at
# extreme corpus sizes, past int64.
_BM25_S = 10**6
_BM25_TOP = 3


@register(
    "text_bm25_scoring",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    corp AS (SELECT CAST(SUM(tf) AS BIGINT) AS big_l,
                    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
             FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df, dl.dl,
             ((2 * c.n_docs - 2 * df.df + 1) * {_BM25_S}) // (2 * df.df + 1)
               AS idf_scaled,
             (CAST(44 AS HUGEINT) * tf.tf * c.big_l * {_BM25_S})
               // (20 * tf.tf * c.big_l + 6 * c.big_l + 18 * dl.dl * c.n_docs)
               AS tfn_scaled
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN corp c
    ),
    ranked AS (
      SELECT doc_id, tok, tf, df, dl,
             CAST(idf_scaled AS BIGINT) AS idf_scaled,
             CAST(tfn_scaled AS BIGINT) AS tfn_scaled,
             CAST((CAST(idf_scaled AS HUGEINT) * tfn_scaled) // {_BM25_S}
                  AS BIGINT) AS bm25_scaled,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY (CAST(idf_scaled AS HUGEINT) * tfn_scaled)
                          // {_BM25_S} DESC, tok
             ) AS rk
      FROM scored
    )
    SELECT doc_id, tok, tf, df, dl, idf_scaled, tfn_scaled, bm25_scaled,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_BM25_TOP} AND doc_id < 50
    ORDER BY doc_id, rk
    """,
    doc=(
        "Okapi BM25 term weighting (k1=1.2, b=0.75) — the retrieval "
        "scoring function behind every lexical search / RAG-recall "
        "stage, computed ENTIRELY in integer rationals: denominators "
        "cleared against avgdl = L/N so tf-normalization is "
        "44·tf·L/(20·tf·L + 6·L + 18·dl·N) and IDF is the log-free "
        "(2N−2df+1)/(2df+1), both pinned as 1e6-scaled integers → "
        "bit-exact across engines where the float/log form drifts. "
        "Top-3 BM25 terms per doc (doc_id<50 projection). Scale: tf/df "
        "are the same two token-count shuffles as TF-IDF; the df side "
        "is vocabulary-sized, corpus stats are a broadcast 1-row "
        "relation; 128-bit intermediates, BIGINT surface."
    ),
    tags=("text", "retrieval", "bm25", "documents"),
)
def text_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tf = tf.cache()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    corp = tf.agg(
        F.sum("tf").cast("long").alias("big_l"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    scored = (
        tf.join(df_, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            "dl",
            F.expr(
                f"((2 * n_docs - 2 * df + 1) * {_BM25_S}) div (2 * df + 1)"
            ).alias("idf_scaled"),
            F.expr(
                f"(CAST(44 AS DECIMAL(38,0)) * tf * big_l * {_BM25_S})"
                f" div (20 * tf * big_l + 6 * big_l + 18 * dl * n_docs)"
            ).alias("tfn_scaled"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("bm25_scaled"), F.asc("tok")
    )
    return (
        scored.withColumn(
            "bm25_scaled",
            F.expr(
                f"CAST((CAST(idf_scaled AS DECIMAL(38,0)) * tfn_scaled)"
                f" div {_BM25_S} AS BIGINT)"
            ),
        )
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.col("dl").cast("long").alias("dl"),
            F.col("idf_scaled").cast("long").alias("idf_scaled"),
            F.col("tfn_scaled").cast("long").alias("tfn_scaled"),
            "bm25_scaled",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter((F.col("rk") <= _BM25_TOP) & (F.col("doc_id") < 50))
        .orderBy("doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# Chat-template rendering + loss-mask accounting (SFT formatting step)
# ---------------------------------------------------------------------------

_CHAT_SYS = "You are a helpful assistant."


@register(
    "text_chat_template_render",
    oracle=f"""
    WITH split AS (
      SELECT doc_id,
             substr(text, 1, LENGTH(text) // 3) AS prompt,
             substr(text, LENGTH(text) // 3 + 1) AS completion
      FROM documents WHERE doc_id < 200
    ),
    rendered AS (
      SELECT doc_id, prompt, completion,
             '<|system|>' || '{_CHAT_SYS}' || '<|end|>' ||
             '<|user|>' || prompt || '<|end|>' ||
             '<|assistant|>' || completion || '<|end|>' AS text_out
      FROM split
    )
    SELECT doc_id,
           CAST(LENGTH(text_out) AS BIGINT) AS n_chars_rendered,
           CAST(len(list_filter(string_split(prompt, ' '), t -> t <> ''))
                AS BIGINT) AS prompt_tokens,
           CAST(len(list_filter(string_split(completion, ' '), t -> t <> ''))
                AS BIGINT) AS completion_tokens,
           CAST(1000 * len(list_filter(string_split(completion, ' '),
                                       t -> t <> ''))
                // GREATEST(len(list_filter(string_split(prompt, ' '),
                                            t -> t <> ''))
                            + len(list_filter(string_split(completion, ' '),
                                              t -> t <> '')), 1)
                AS BIGINT) AS loss_frac_permille,
           sha256(text_out) AS render_sha
    FROM rendered
    ORDER BY doc_id
    """,
    doc=(
        "Chat-template rendering — the SFT/instruction-tuning "
        "formatting step: each document splits into a prompt third "
        "and a completion remainder, renders through the "
        "system/user/assistant special-token template, and the "
        "loss-mask accounting every trainer needs is pinned alongside "
        "(completion tokens / total tokens, permille — the fraction "
        "of positions that actually contribute gradient under "
        "prompt-masking). The rendered string itself is pinned by "
        "sha256, so a one-character template drift fails the hash. "
        "Pure string expressions in the row path (concat / substr / "
        "split / filter — whole-stage codegen), one scan, no "
        "shuffle except the output sort."
    ),
    tags=("text", "training-pipeline", "sft", "documents"),
)
def text_chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    split = d.select(
        "doc_id",
        F.expr("substr(text, 1, length(text) div 3)").alias("prompt"),
        F.expr("substr(text, length(text) div 3 + 1)").alias("completion"),
    )
    rendered = split.withColumn(
        "text_out",
        F.concat(
            F.lit("<|system|>"), F.lit(_CHAT_SYS), F.lit("<|end|>"),
            F.lit("<|user|>"), F.col("prompt"), F.lit("<|end|>"),
            F.lit("<|assistant|>"), F.col("completion"), F.lit("<|end|>"),
        ),
    )
    ptoks = F.size(F.filter(F.split("prompt", " "), lambda t: t != ""))
    ctoks = F.size(F.filter(F.split("completion", " "), lambda t: t != ""))
    return rendered.select(
        "doc_id",
        F.length("text_out").cast("long").alias("n_chars_rendered"),
        ptoks.cast("long").alias("prompt_tokens"),
        ctoks.cast("long").alias("completion_tokens"),
        F.expr(
            "CAST(1000 * size(filter(split(completion, ' '), t -> t <> ''))"
            " div greatest(size(filter(split(prompt, ' '), t -> t <> ''))"
            " + size(filter(split(completion, ' '), t -> t <> '')), 1)"
            " AS BIGINT)"
        ).alias("loss_frac_permille"),
        F.sha2("text_out", 256).alias("render_sha"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (degree/frequency word scores)
# ---------------------------------------------------------------------------

_RAKE_S = 10**6
_RAKE_NDOC = 100


@register(
    "text_rake_keyphrases",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, u.i AS pos, t[u.i] AS tok,
             CAST(t[u.i] IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}') AS BIGINT)
               AS is_stop
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE doc_id < {_RAKE_NDOC}),
           UNNEST(generate_series(1, len(t))) AS u(i)
      WHERE t[u.i] <> ''
    ),
    seg AS MATERIALIZED (
      SELECT doc_id, pos, tok, is_stop,
             SUM(is_stop) OVER (
               PARTITION BY doc_id ORDER BY pos
             ) AS phrase_id
      FROM toks
    ),
    words AS MATERIALIZED (
      SELECT doc_id, phrase_id, pos, tok FROM seg WHERE is_stop = 0
    ),
    plen AS MATERIALIZED (
      SELECT doc_id, phrase_id, COUNT(*) AS phrase_len
      FROM words GROUP BY doc_id, phrase_id
    ),
    wstat AS MATERIALIZED (
      SELECT w.tok,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.phrase_len) AS BIGINT) AS degree
      FROM words w JOIN plen p USING (doc_id, phrase_id)
      GROUP BY w.tok
    ),
    pscore AS (
      SELECT w.doc_id, w.phrase_id,
             string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM((s.degree * {_RAKE_S}) // s.freq) AS BIGINT)
               AS rake_scaled
      FROM words w JOIN wstat s USING (tok)
      GROUP BY w.doc_id, w.phrase_id
    ),
    best AS (
      SELECT doc_id, phrase, n_words, rake_scaled,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY rake_scaled DESC, phrase
             ) AS rk
      FROM pscore
    )
    SELECT doc_id, phrase, n_words, rake_scaled
    FROM best WHERE rk = 1
    ORDER BY doc_id
    """,
    doc=(
        "RAKE keyphrase extraction (Rose et al.) — candidate phrases "
        "are maximal stopword-free token runs (segmentation by a "
        "running stopword count, NOT string surgery, so both engines "
        "segment identically), each word scored degree/frequency "
        "(degree = summed length of phrases containing it — favors "
        "words that live in long collocations), phrase score = sum "
        "of member word scores as 1e6-scaled floor ratios, top "
        "phrase per document with a deterministic tiebreak. The "
        "document-level keyword signal a corpus indexer/tagger runs "
        "beside TF-IDF/BM25. Scale: two token shuffles (word stats "
        "are vocabulary-sized), phrase reassembly is a grouped "
        "ordered string_agg keyed by (doc, phrase)."
    ),
    tags=("text", "keyphrase", "rake", "documents"),
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _RAKE_NDOC)
    toks = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "tok",
            F.col("tok").isin(*STOPWORDS).cast("long").alias("is_stop"),
        )
    )
    wseg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = toks.withColumn("phrase_id", F.sum("is_stop").over(wseg))
    words = seg.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "pos", "tok"
    )
    words = words.cache()
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("phrase_len").cast("long").alias("degree"),
        )
    )
    pscore = (
        words.join(F.broadcast(wstat), "tok")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.expr(f"(degree * {_RAKE_S}) div freq"))
            .cast("long")
            .alias("rake_scaled"),
        )
    )
    wbest = Window.partitionBy("doc_id").orderBy(
        F.desc("rake_scaled"), F.asc("phrase")
    )
    return (
        pscore.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("doc_id", "phrase", "n_words", "rake_scaled")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic MLM token masking (pretraining data prep)
# ---------------------------------------------------------------------------

_MLM_PCT = 15  # mask ~15% of tokens (BERT convention)
_MLM_NDOC = 100


@register(
    "text_mlm_masking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.i AS pos, t[u.i] AS tok,
             CAST(CAST('0x' || substr(md5(doc_id || '-' || u.i), 1, 8)
                       AS BIGINT) % 100 < {_MLM_PCT} AS BIGINT) AS is_masked
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE doc_id < {_MLM_NDOC}),
           UNNEST(generate_series(1, len(t))) AS u(i)
      WHERE t[u.i] <> ''
    )
    SELECT doc_id,
           string_agg(CASE WHEN is_masked = 1 THEN '[MASK]' ELSE tok END,
                      ' ' ORDER BY pos) AS masked_text,
           string_agg(CASE WHEN is_masked = 1 THEN tok END, ' ' ORDER BY pos)
             AS targets,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           CAST(1000 * SUM(is_masked) // COUNT(*) AS BIGINT)
             AS mask_permille
    FROM toks
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc=(
        "Deterministic MLM masking — the BERT-style pretraining data "
        "prep step: ~15% of positions selected by a position-keyed "
        "md5 draw (so the corruption is reproducible across runs, "
        "engines and retries — the property a distributed pipeline "
        "needs, where random.random() per worker is nondeterministic "
        "under retry), masked text rebuilt with [MASK] sentinels, "
        "the target tokens kept position-ordered for the label "
        "stream, per-doc mask-rate accounting pinned. One explode + "
        "one ordered grouped string_agg; the md5 draw is the same "
        "hash-split primitive as sample_bernoulli_hash."
    ),
    tags=("text", "training-pipeline", "mlm", "documents"),
)
def text_mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _MLM_NDOC)
    toks = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "tok",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "-",
                                F.col("doc_id").cast("string"),
                                (F.col("pos0") + 1).cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100
                < _MLM_PCT
            )
            .cast("long")
            .alias("is_masked"),
        )
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("pos", "tok", "is_masked"))
    )
    return (
        toks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    ordered,
                    lambda x: F.when(
                        x["is_masked"] == 1, F.lit("[MASK]")
                    ).otherwise(x["tok"]),
                ),
                " ",
            ).alias("masked_text"),
            F.array_join(
                F.transform(
                    F.filter(ordered, lambda x: x["is_masked"] == 1),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("targets"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("is_masked").cast("long").alias("n_masked"),
        )
        .select(
            "doc_id",
            "masked_text",
            F.when(F.col("targets") == "", None)
            .otherwise(F.col("targets"))
            .alias("targets"),
            "n_tokens",
            "n_masked",
            F.expr("CAST(1000 * n_masked div n_tokens AS BIGINT)").alias(
                "mask_permille"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities (all-integer rational form)
# ---------------------------------------------------------------------------

_KN_S = 10**9
_KN_D_NUM, _KN_D_DEN = 3, 4  # absolute discount D = 0.75


@register(
    "text_kneser_ney_counts",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), big AS (
      SELECT b.pair[1] AS tok, b.pair[2] AS nxt
      FROM w, unnest(list_zip(ws[1:len(ws)-1], ws[2:])) AS b(pair)
      WHERE b.pair[1] <> '' AND b.pair[2] <> ''
    ), cnt AS (
      SELECT tok, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM big GROUP BY tok, nxt
    ), ctx AS (
      SELECT tok, CAST(SUM(c) AS BIGINT) AS c_ctx,
             CAST(COUNT(*) AS BIGINT) AS n1plus_fwd
      FROM cnt GROUP BY tok
    ), cont AS (
      SELECT nxt, CAST(COUNT(*) AS BIGINT) AS n1plus_back
      FROM cnt GROUP BY nxt
    ), n_types AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM cnt
    )
    SELECT c.tok, c.nxt, c.c,
           x.c_ctx, x.n1plus_fwd, b.n1plus_back,
           CAST(((c.c * {_KN_D_DEN} - {_KN_D_NUM}) * {_KN_S})
                // (x.c_ctx * {_KN_D_DEN}) AS BIGINT) AS p_discounted_scaled,
           CAST(({_KN_D_NUM} * x.n1plus_fwd * {_KN_S})
                // (x.c_ctx * {_KN_D_DEN}) AS BIGINT) AS lambda_scaled,
           CAST((b.n1plus_back * {_KN_S}) // t.n_bigram_types AS BIGINT)
             AS p_continuation_scaled
    FROM cnt c
    JOIN ctx x USING (tok)
    JOIN cont b ON b.nxt = c.nxt
    CROSS JOIN n_types t
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c.tok ORDER BY c.c DESC, c.nxt)
            <= 3
    ORDER BY c.tok, c.c DESC, c.nxt
    """,
    doc=(
        "Kneser-Ney smoothed bigram model components — the LM-quality "
        "completer beyond raw bigram counts: per surviving bigram, the "
        "absolute-discounted probability (c - D)/c_ctx with D=0.75 "
        "carried as the exact rational (4c-3)/(4*c_ctx), the backoff "
        "weight lambda = D*N1+(w,·)/c_ctx, and the CONTINUATION "
        "probability N1+(·,w)/|bigram types| — the KN insight that "
        "'how many contexts precede w' beats 'how often w occurs' for "
        "backoff mass. All three pinned as 1e9-scaled integers, top-3 "
        "continuations per context with deterministic tiebreak. "
        "Scale: one zero-shuffle zipped bigram build, then "
        "vocabulary-sized aggregates on (tok), (nxt) and the type "
        "count — the same three shuffles any KN trainer needs, "
        "mergeable partial+final all the way."
    ),
    tags=("text", "lm", "kneser-ney", "documents"),
)
def text_kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    ws = d.select(F.split(F.col("text"), " ").alias("ws"))
    big = ws.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i-1] AS tok, ws[i] AS nxt)),"
                " p -> p.tok <> '' AND p.nxt <> '')"
            )
        ).alias("p")
    ).select("p.tok", "p.nxt")
    cnt = big.groupBy("tok", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cnt = cnt.cache()
    ctx = cnt.groupBy("tok").agg(
        F.sum("c").cast("long").alias("c_ctx"),
        F.count(F.lit(1)).cast("long").alias("n1plus_fwd"),
    )
    cont = cnt.groupBy("nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n1plus_back")
    )
    n_types = cnt.agg(F.count(F.lit(1)).cast("long").alias("n_bigram_types"))
    w = Window.partitionBy("tok").orderBy(F.desc("c"), F.asc("nxt"))
    return (
        cnt.join(ctx, "tok")
        .join(cont, "nxt")
        .crossJoin(F.broadcast(n_types))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "tok", "nxt", "c", "c_ctx", "n1plus_fwd", "n1plus_back",
            F.expr(
                f"CAST(((c * {_KN_D_DEN} - {_KN_D_NUM}) * {_KN_S})"
                f" div (c_ctx * {_KN_D_DEN}) AS BIGINT)"
            ).alias("p_discounted_scaled"),
            F.expr(
                f"CAST(({_KN_D_NUM} * n1plus_fwd * {_KN_S})"
                f" div (c_ctx * {_KN_D_DEN}) AS BIGINT)"
            ).alias("lambda_scaled"),
            F.expr(
                f"CAST((n1plus_back * {_KN_S}) div n_bigram_types AS BIGINT)"
            ).alias("p_continuation_scaled"),
        )
        .orderBy("tok", F.desc("c"), "nxt")
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit (V = K * n^beta) at bounded checkpoints
# ---------------------------------------------------------------------------

_HEAPS_CKPTS = 50


@register(
    "text_heaps_law_fit",
    oracle=f"""
    WITH n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m FROM toks GROUP BY doc_id
    ),
    firsts AS (SELECT token, MIN(doc_id) AS fd FROM toks GROUP BY token),
    news AS (
      SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS v
      FROM firsts GROUP BY fd
    ),
    per_bucket AS (
      SELECT CAST((p.doc_id * {_HEAPS_CKPTS}) // n.n_docs AS BIGINT) AS bkt,
             SUM(p.m) AS bm, SUM(COALESCE(nw.v, 0)) AS bv
      FROM per_doc p LEFT JOIN news nw ON p.doc_id = nw.doc_id, n
      GROUP BY 1
    ),
    series AS (
      SELECT bkt,
             SUM(bm) OVER (ORDER BY bkt) AS cum_n,
             SUM(bv) OVER (ORDER BY bkt) AS cum_v
      FROM per_bucket
    ),
    pts AS (
      SELECT bkt,
             round(ln(CAST(cum_n AS DOUBLE)), 9) AS x,
             round(ln(CAST(cum_v AS DOUBLE)), 9) AS y,
             cum_n, cum_v
      FROM series
    ),
    packed AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_checkpoints,
             CAST(MAX(cum_n) AS BIGINT) AS tokens_total,
             CAST(MAX(cum_v) AS BIGINT) AS vocab_total,
             list_reduce(list(x ORDER BY bkt), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY bkt), (a, b) -> a + b) AS sy,
             list_reduce(list(x * x ORDER BY bkt), (a, b) -> a + b) AS sxx,
             list_reduce(list(x * y ORDER BY bkt), (a, b) -> a + b) AS sxy
      FROM pts
    )
    SELECT n_checkpoints, tokens_total, vocab_total,
           (CAST(n_checkpoints AS DOUBLE) * sxy - sx * sy)
           / (CAST(n_checkpoints AS DOUBLE) * sxx - sx * sx) AS beta,
           (sy - ((CAST(n_checkpoints AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n_checkpoints AS DOUBLE) * sxx - sx * sx)) * sx)
           / CAST(n_checkpoints AS DOUBLE) AS ln_k
    FROM packed
    """,
    doc=(
        "Heaps'-law fit over the corpus: log-log OLS of cumulative "
        "vocabulary size V(n) against cumulative token count n "
        "(V = K*n^beta; Heaps 1978), sampled at "
        f"{_HEAPS_CKPTS} doc_id-ordered corpus checkpoints rather than "
        "at every document — the growth series a 100 TB vocabulary "
        "audit can afford: two corpus-sized aggregates (tokens per "
        "doc; first-occurrence doc per token, the same min-groupBy a "
        "vocabulary build uses), one O(checkpoints) bucket aggregate "
        "(bucket = doc_id*B/N, monotone in doc_id so cumulative order "
        "is preserved), and every window/fold thereafter runs on the "
        "50-row summary. Per-point ln() values are quantized to 9dp "
        "(ln is not IEEE-portable across engines) and the four OLS "
        "sums accumulate via an ORDERED left fold over the "
        "bucket-sorted array (F.aggregate / DuckDB list_reduce), so "
        "the slope/intercept doubles are bit-exact. beta ~0.5-0.8 on "
        "natural text; beta near 1 flags synthetic or over-"
        "deduplicated corpora — a dataset-card metric for LLM "
        "training data."
    ),
    tags=("text", "documents", "regression", "scale"),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    n_docs = d.agg((F.max("doc_id") + 1).alias("n_docs"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    news = (
        toks.groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    per_bucket = (
        per_doc.join(news, "doc_id", "left")
        .fillna(0, ["v"])
        .crossJoin(F.broadcast(n_docs))
        .groupBy(
            ((F.col("doc_id") * _HEAPS_CKPTS) / F.col("n_docs"))
            .cast("long")
            .alias("bkt")
        )
        .agg(F.sum("m").alias("bm"), F.sum("v").alias("bv"))
    )
    w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    series = per_bucket.select(
        "bkt",
        F.sum("bm").over(w).alias("cum_n"),
        F.sum("bv").over(w).alias("cum_v"),
    )
    pts = series.select(
        "bkt",
        F.round(F.log(F.col("cum_n").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("cum_v").cast("double")), 9).alias("y"),
        "cum_n",
        "cum_v",
    )
    packed = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_checkpoints"),
        F.max("cum_n").cast("long").alias("tokens_total"),
        F.max("cum_v").cast("long").alias("vocab_total"),
        F.array_sort(F.collect_list(F.struct("bkt", "x", "y"))).alias("s"),
    )
    fold = lambda expr: F.aggregate(  # noqa: E731
        F.col("s"), F.lit(0.0), lambda acc, e: acc + expr(e)
    )
    sums = packed.select(
        "n_checkpoints",
        "tokens_total",
        "vocab_total",
        fold(lambda e: e["x"]).alias("sx"),
        fold(lambda e: e["y"]).alias("sy"),
        fold(lambda e: e["x"] * e["x"]).alias("sxx"),
        fold(lambda e: e["x"] * e["y"]).alias("sxy"),
    )
    n_d = F.col("n_checkpoints").cast("double")
    beta = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "n_checkpoints",
        "tokens_total",
        "vocab_total",
        beta.alias("beta"),
        ((F.col("sy") - beta * F.col("sx")) / n_d).alias("ln_k"),
    )


# --------------------------------------------------------------------------
# Set-containment search (query-terms retrieval primitive)
# --------------------------------------------------------------------------

_CONT_QUERY = ("spark", "table", "join", "window", "agg", "scan", "merge", "batch")
_CONT_TOPK = 20


@register(
    "text_containment_search",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_intersect(
               list_distinct(string_split(text, ' ')),
               [{", ".join(f"'{t}'" for t in _CONT_QUERY)}]
             )) AS n_hit
      FROM documents
    )
    SELECT doc_id, CAST(n_hit AS BIGINT) AS n_hit,
           CAST((1000 * n_hit) // {len(_CONT_QUERY)} AS BIGINT)
             AS containment_permille
    FROM scored
    ORDER BY n_hit DESC, doc_id
    LIMIT {_CONT_TOPK}
    """,
    doc=(
        "Set-containment retrieval: score every document by Jaccard "
        f"CONTAINMENT of a {len(_CONT_QUERY)}-term query set "
        "(|Q ∩ tokens(D)| / |Q| — the asymmetric measure search and "
        "dedup-probe systems use when the query is much smaller than "
        "the document), then top-k. The query set is a plan-time "
        "literal array, so scoring is one codegen'd array_intersect "
        "per row — ZERO shuffles before the top-k "
        "(TakeOrderedAndProject); the corpus is touched once and "
        "never moves. The integer permille makes ranking bit-exact. "
        "At 100 TB this is the map-side filter stage in front of any "
        "heavier ranker (BM25 here lives in text_bm25_scoring)."
    ),
    tags=("text", "search", "similarity"),
)
def text_containment_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    q = F.array(*[F.lit(t) for t in _CONT_QUERY])
    n_hit = F.size(
        F.array_intersect(F.array_distinct(F.split(F.col("text"), " ")), q)
    )
    return (
        d.select(
            "doc_id",
            n_hit.cast("long").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_hit",
            F.expr(f"(1000 * n_hit) div {len(_CONT_QUERY)}").alias(
                "containment_permille"
            ),
        )
        .orderBy(F.col("n_hit").desc(), "doc_id")
        .limit(_CONT_TOPK)
    )


# --------------------------------------------------------------------------
# Exact-match / token-F1 generation eval (the SQuAD-style reader metric)
# --------------------------------------------------------------------------


@register(
    "ml_llm_eval_em_f1",
    oracle="""
    WITH base AS (
      SELECT doc_id, doc_id % 3 AS bucket,
             list_slice(string_split(text, ' '), 1, 8) AS ref_toks
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    pairs AS (
      SELECT doc_id, bucket, ref_toks,
             CASE bucket
               WHEN 0 THEN ref_toks
               WHEN 1 THEN list_reverse(ref_toks)
               ELSE list_slice(ref_toks, 1, 4)
             END AS pred_toks
      FROM base
    ),
    ref_c AS (
      SELECT doc_id, tok, COUNT(*) AS c_ref
      FROM (SELECT doc_id, unnest(ref_toks) AS tok FROM pairs)
      GROUP BY doc_id, tok
    ),
    pred_c AS (
      SELECT doc_id, tok, COUNT(*) AS c_pred
      FROM (SELECT doc_id, unnest(pred_toks) AS tok FROM pairs)
      GROUP BY doc_id, tok
    ),
    overlap AS (
      SELECT r.doc_id, SUM(LEAST(r.c_ref, p.c_pred)) AS n_common
      FROM ref_c r JOIN pred_c p
        ON r.doc_id = p.doc_id AND r.tok = p.tok
      GROUP BY r.doc_id
    ),
    scored AS (
      SELECT q.doc_id, q.bucket,
             CASE WHEN array_to_string(q.pred_toks, ' ')
                     = array_to_string(q.ref_toks, ' ')
                  THEN 1 ELSE 0 END AS em,
             (2000 * COALESCE(o.n_common, 0))
               // (len(q.pred_toks) + len(q.ref_toks)) AS f1_permille
      FROM pairs q LEFT JOIN overlap o ON q.doc_id = o.doc_id
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((1000 * SUM(em)) // COUNT(*) AS BIGINT) AS em_permille,
           CAST(SUM(f1_permille) // COUNT(*) AS BIGINT)
             AS mean_f1_permille
    FROM scored
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc=(
        "Generation eval — exact match + token-level F1, the "
        "SQuAD/DROP reader metric every LLM eval harness computes: "
        "F1 from the token MULTISET overlap (per-token min of "
        "occurrence counts — the part naive set-intersect gets "
        "wrong on repeated tokens), EM from string equality, both "
        "as exact integer permille. Predictions are a deterministic "
        "three-bucket transform of the reference (identity / "
        "reversed / truncated-half), so the expected readout is "
        "known by construction (EM=1000/0/0; F1=1000/1000/~667) and "
        "the metric implementation — not the model — is what gets "
        "hash-checked. 100 TB shape: token-count aggregates keyed "
        "by (doc, token), one keyed overlap join, one bucket "
        "rollup; no driver-side scoring loop."
    ),
    tags=("text", "llm", "eval"),
)
def ml_llm_eval_em_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        (F.col("doc_id") % 3).alias("bucket"),
        F.slice(toks, 1, 8).alias("ref_toks"),
    ).filter(F.size(toks) >= 8)
    pred = (
        F.when(F.col("bucket") == 0, F.col("ref_toks"))
        .when(F.col("bucket") == 1, F.reverse(F.col("ref_toks")))
        .otherwise(F.slice(F.col("ref_toks"), 1, 4))
    )
    pairs = base.withColumn("pred_toks", pred).cache()
    ref_c = (
        pairs.select("doc_id", F.explode("ref_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    pred_c = (
        pairs.select("doc_id", F.explode("pred_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c_pred"))
    )
    overlap = (
        ref_c.join(pred_c, ["doc_id", "tok"])
        .groupBy("doc_id")
        .agg(F.sum(F.least("c_ref", "c_pred")).alias("n_common"))
    )
    scored = (
        pairs.join(overlap, "doc_id", "left")
        .select(
            "bucket",
            (
                F.array_join("pred_toks", " ") == F.array_join("ref_toks", " ")
            )
            .cast("long")
            .alias("em"),
            F.expr(
                "(2000 * COALESCE(n_common, 0))"
                " div (size(pred_toks) + size(ref_toks))"
            ).alias("f1_permille"),
        )
    )
    return (
        scored.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("(1000 * SUM(em)) div COUNT(*)").alias("em_permille"),
            F.expr("SUM(f1_permille) div COUNT(*)").alias("mean_f1_permille"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# SFT chat-record format validation (the dataset gate before training)
# --------------------------------------------------------------------------


@register(
    "text_sft_format_validate",
    oracle="""
    WITH built AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN ['user', 'assistant', 'user']
                  WHEN doc_id % 9 = 0
                  THEN ['user', 'user', 'user', 'assistant']
                  ELSE ['user', 'assistant', 'user', 'assistant'] END
               AS roles,
             CASE WHEN doc_id % 5 = 0
                  THEN [t[1], t[2], t[3]]
                  WHEN doc_id % 7 = 0
                  THEN [t[1], t[2], '', t[4]]
                  ELSE [t[1], t[2], t[3], t[4]] END AS contents
      FROM (
        SELECT doc_id,
               [array_to_string(list_slice(w, 1, 5), ' '),
                array_to_string(list_slice(w, 6, 10), ' '),
                array_to_string(list_slice(w, 11, 15), ' '),
                array_to_string(list_slice(w, 16, 20), ' ')] AS t
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 20)
      )
    ),
    flagged AS (
      SELECT doc_id,
             CASE WHEN roles[len(roles)] = 'user' THEN 1 ELSE 0 END
               AS ends_with_user,
             CASE WHEN len(list_filter(contents, c -> c = '')) > 0
                  THEN 1 ELSE 0 END AS empty_message,
             CASE WHEN len(list_filter(range(1, len(roles)),
                                       i -> roles[i] = roles[i + 1])) > 0
                  THEN 1 ELSE 0 END AS role_repeat
      FROM built
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(ends_with_user) AS BIGINT) AS n_ends_with_user,
           CAST(SUM(empty_message) AS BIGINT) AS n_empty_message,
           CAST(SUM(role_repeat) AS BIGINT) AS n_role_repeat,
           CAST(SUM(CASE WHEN ends_with_user = 0 AND empty_message = 0
                         AND role_repeat = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST((1000 * SUM(CASE WHEN ends_with_user = 0
                                 AND empty_message = 0
                                 AND role_repeat = 0 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS clean_permille
    FROM flagged
    """,
    doc=(
        "SFT dataset format gate — the validation pass a chat-"
        "template training pipeline runs before a single GPU-hour is "
        "spent: every record's turn structure is checked for (a) "
        "ending on a user turn (no training target), (b) empty "
        "message bodies, (c) consecutive same-role turns (template "
        "ambiguity). Records are synthesized from documents with "
        "violations INJECTED deterministically by doc_id residue, so "
        "the expected violation counts are known by construction and "
        "the validator itself is what gets hash-checked. All checks "
        "are codegen'd array HOFs (element_at/filter/exists) — one "
        "scan, zero shuffles before the 1-row rollup. Companion to "
        "text_chat_template_render (render assumes valid; this is "
        "the gate that makes that assumption safe)."
    ),
    tags=("text", "llm", "dq"),
)
def text_sft_format_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    base = d.filter(F.size(w) >= 20).select(
        "doc_id",
        F.array(
            *[
                F.array_join(F.slice(F.split(F.col("text"), " "), 1 + 5 * i, 5), " ")
                for i in range(4)
            ]
        ).alias("t"),
    )
    roles = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(F.lit("user"), F.lit("assistant"), F.lit("user")),
        )
        .when(
            F.col("doc_id") % 9 == 0,
            F.array(F.lit("user"), F.lit("user"), F.lit("user"), F.lit("assistant")),
        )
        .otherwise(
            F.array(
                F.lit("user"), F.lit("assistant"), F.lit("user"), F.lit("assistant")
            )
        )
    )
    contents = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(F.expr("t[0]"), F.expr("t[1]"), F.expr("t[2]")),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.array(F.expr("t[0]"), F.expr("t[1]"), F.lit(""), F.expr("t[3]")),
        )
        .otherwise(F.col("t"))
    )
    built = base.select("doc_id", roles.alias("roles"), contents.alias("contents"))
    flagged = built.select(
        F.expr("CASE WHEN element_at(roles, -1) = 'user' THEN 1 ELSE 0 END").alias(
            "ends_with_user"
        ),
        F.expr(
            "CASE WHEN exists(contents, c -> c = '') THEN 1 ELSE 0 END"
        ).alias("empty_message"),
        F.expr(
            "CASE WHEN exists(sequence(1, size(roles) - 1), "
            "i -> element_at(roles, i) = element_at(roles, i + 1)) "
            "THEN 1 ELSE 0 END"
        ).alias("role_repeat"),
    )
    clean = (
        (F.col("ends_with_user") == 0)
        & (F.col("empty_message") == 0)
        & (F.col("role_repeat") == 0)
    ).cast("long")
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum("ends_with_user").cast("long").alias("n_ends_with_user"),
        F.sum("empty_message").cast("long").alias("n_empty_message"),
        F.sum("role_repeat").cast("long").alias("n_role_repeat"),
        F.sum(clean).cast("long").alias("n_clean"),
        F.expr("CAST((1000 * SUM(CASE WHEN ends_with_user = 0 "
               "AND empty_message = 0 AND role_repeat = 0 THEN 1 ELSE 0 END))"
               " div COUNT(*) AS BIGINT)").alias("clean_permille"),
    )


# --------------------------------------------------------------------------
# DPO/RLHF preference-pair construction
# --------------------------------------------------------------------------


@register(
    "pipeline_dpo_pair_construction",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 12
    ),
    cands AS (
      SELECT doc_id, source,
             array_to_string(list_slice(w, 1, 6), ' ') AS prompt,
             array_to_string(list_slice(w, 7, 12), ' ') AS comp_a,
             array_to_string(list_reverse(list_slice(w, 7, 12)), ' ')
               AS comp_b,
             len(list_filter(list_slice(w, 7, 12),
                             t -> len(t) >= 5)) AS score_a,
             len(list_filter(list_slice(w, 7, 12),
                             t -> len(t) >= 4)) AS score_b
      FROM base
    ),
    pairs AS (
      SELECT doc_id, source,
             CASE WHEN score_a >= score_b THEN comp_a ELSE comp_b END
               AS chosen,
             CASE WHEN score_a >= score_b THEN comp_b ELSE comp_a END
               AS rejected,
             ABS(score_a - score_b) AS margin
      FROM cands
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_prompts,
           CAST(SUM(CASE WHEN margin > 0 AND chosen <> rejected
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN margin = 0 OR chosen = rejected
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN margin > 0 AND chosen <> rejected
                    THEN margin ELSE 0 END) AS BIGINT) AS margin_sum
    FROM pairs
    GROUP BY source
    ORDER BY source
    """,
    doc=(
        "DPO / RLHF preference-pair construction — the data-"
        "engineering pass between reward scoring and preference "
        "tuning: per prompt, two candidate completions are scored "
        "(here by deterministic token-length heuristics standing in "
        "for a reward model), the higher-scored one becomes 'chosen' "
        "with a fixed tie-break, and pairs with NO preference signal "
        "(zero margin, or textually identical completions — both "
        "would contribute zero DPO gradient) are dropped and "
        "accounted. Per-source yield + margin mass is exactly the "
        "audit a preference-data pipeline reports. One scan, all "
        "codegen'd array HOFs, one partial+final rollup; at 100 TB "
        "the per-prompt work is embarrassingly parallel and only "
        "source-grain aggregates move."
    ),
    tags=("text", "llm", "pipeline"),
)
def pipeline_dpo_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    base = d.filter(F.size(w) >= 12).select("doc_id", "source", w.alias("w"))
    mid = F.slice(F.col("w"), 7, 6)
    cands = base.select(
        "doc_id",
        "source",
        F.array_join(mid, " ").alias("comp_a"),
        F.array_join(F.reverse(mid), " ").alias("comp_b"),
        F.size(F.filter(mid, lambda t: F.length(t) >= 5)).alias("score_a"),
        F.size(F.filter(mid, lambda t: F.length(t) >= 4)).alias("score_b"),
    )
    chosen = F.when(
        F.col("score_a") >= F.col("score_b"), F.col("comp_a")
    ).otherwise(F.col("comp_b"))
    rejected = F.when(
        F.col("score_a") >= F.col("score_b"), F.col("comp_b")
    ).otherwise(F.col("comp_a"))
    pairs = cands.select(
        "source",
        chosen.alias("chosen"),
        rejected.alias("rejected"),
        F.abs(F.col("score_a") - F.col("score_b")).alias("margin"),
    )
    keep = (F.col("margin") > 0) & (F.col("chosen") != F.col("rejected"))
    return (
        pairs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prompts"),
            F.sum(keep.cast("long")).cast("long").alias("n_pairs"),
            F.sum((~keep).cast("long")).cast("long").alias("n_dropped"),
            F.sum(F.when(keep, F.col("margin")).otherwise(0))
            .cast("long")
            .alias("margin_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer-vocabulary coverage / OOV-rate audit
# ---------------------------------------------------------------------------

_VOCAB_V = 400  # train-split vocabulary size


@register(
    "text_vocab_oov_coverage",
    oracle=f"""
    WITH train_toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 2 = 0
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS cnt FROM train_toks
        WHERE tok <> '' GROUP BY tok
      ) ORDER BY cnt DESC, tok LIMIT {_VOCAB_V}
    ),
    eval_toks AS (
      SELECT lang, tok FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 2 = 1
      ) WHERE tok <> ''
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST((1000 * SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS oov_permille
    FROM eval_toks e LEFT JOIN vocab v ON v.tok = e.tok
    GROUP BY lang
    ORDER BY lang
    """,
    doc=(
        "Tokenizer-vocabulary coverage audit — the question every "
        "LLM-data team asks before committing a vocab: freeze the "
        "top-V tokens of the TRAIN split, then measure the "
        "out-of-vocabulary token rate per language on the held-out "
        "split (high OOV = the tokenizer will shatter that slice into "
        "bytes/unk). Plan shape: train token counts are one keyed agg; "
        "the top-V cut is orderBy+limit — Spark plans "
        "TakeOrderedAndProject, the per-partition-heap + driver-merge "
        "idiom that never funnels the token table through one task; "
        "the vocab then BROADCASTS into a left join against the eval "
        "token stream (map-side, no shuffle of the corpus). Counts and "
        "floored permille rates are exact integers. At 100 TB the "
        "vocab stays V rows regardless of corpus size — the join side "
        "scales, the broadcast side never does."
    ),
    tags=("text", "llm-pipeline", "documents"),
)
def text_vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    train_toks = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = (
        train_toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(_VOCAB_V)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    eval_toks = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    joined = eval_toks.join(F.broadcast(vocab), "tok", "left")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "CAST((1000 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END))"
                " div count(*) AS BIGINT)"
            ).alias("oov_permille"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Code-vs-prose routing heuristic (pre-training corpus router)
# ---------------------------------------------------------------------------

_CODE_S = 1000  # permille scale


@register(
    "text_code_detection_router",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text,
               '[{{}}();=<>\\[\\]]', '', 'g')) AS n_symbols,
             length(text) - length(replace(text, ' ', '')) AS n_spaces,
             CASE WHEN doc_id % 11 = 0 THEN
               'def f_' || CAST(doc_id AS VARCHAR) ||
               '(x): {{ return (x[0] <= 1); }};'
             ELSE '' END AS injected
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             n_chars + length(injected) AS n_chars,
             n_symbols
               + length(injected)
               - length(regexp_replace(injected,
                   '[{{}}();=<>\\[\\]]', '', 'g')) AS n_symbols
      FROM feats
    ),
    flagged AS (
      SELECT doc_id, lang, n_chars, n_symbols,
             ({_CODE_S} * n_symbols) // n_chars AS symbol_permille,
             CASE WHEN ({_CODE_S} * n_symbols) // n_chars >= 15
                  THEN 1 ELSE 0 END AS is_code
      FROM scored WHERE n_chars > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_code) AS BIGINT) AS n_code,
           CAST(SUM(CASE WHEN is_code = 1 THEN n_chars ELSE 0 END)
                AS BIGINT) AS code_chars,
           CAST(MAX(symbol_permille) AS BIGINT) AS max_symbol_permille
    FROM flagged
    GROUP BY lang
    ORDER BY lang
    """,
    doc=(
        "Code-vs-prose routing — the pre-training corpus router that "
        "decides whether a document goes to the code pipeline (its own "
        "dedup/quality rules) or the text pipeline: a symbol-density "
        "heuristic over the characters natural prose rarely uses "
        "({{}}();=<>[]), thresholded at 15 permille. Every 11th doc "
        "gets a code snippet INJECTED so both router branches carry "
        "real mass and the threshold genuinely separates (a router "
        "audit with an empty branch proves nothing). Pure JVM "
        "regexp-strip length arithmetic, integer permille — the "
        "one-scan shape of every corpus-routing pass; compare "
        "text_quality_score (prose quality) and "
        "mm_modality_router (binary payloads): same family, "
        "different signal."
    ),
    tags=("text", "llm-pipeline", "documents"),
)
def text_code_detection_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sym = "[{}();=<>\\[\\]]"
    injected = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit("def f_"),
            F.col("doc_id").cast("string"),
            F.lit("(x): { return (x[0] <= 1); };"),
        ),
    ).otherwise(F.lit(""))
    feats = docs.select(
        "doc_id",
        "lang",
        (F.length("text") + F.length(injected)).alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", sym, ""))
            + F.length(injected)
            - F.length(F.regexp_replace(injected, sym, ""))
        ).alias("n_symbols"),
    )
    flagged = feats.filter(F.col("n_chars") > 0).select(
        "lang",
        "n_chars",
        "n_symbols",
        F.expr(f"({_CODE_S} * n_symbols) div n_chars").alias(
            "symbol_permille"
        ),
        (
            F.expr(f"({_CODE_S} * n_symbols) div n_chars") >= 15
        )
        .cast("long")
        .alias("is_code"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_code").cast("long").alias("n_code"),
            F.sum(F.when(F.col("is_code") == 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("code_chars"),
            F.max("symbol_permille").cast("long").alias("max_symbol_permille"),
        )
        .orderBy("lang")
    )
