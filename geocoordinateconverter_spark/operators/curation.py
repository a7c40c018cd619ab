"""Corpus-curation operators for the training-data pipeline:
deterministic stratified sampling, concat-and-chunk sequence packing,
PII redaction, and duplicate n-gram span detection (the bounded
exact-substring-dedup analog of Lee et al., "Deduplicating Training
Data Makes Language Models Better").

Same design rules as :mod:`textdedup` (these are the r5 additions to
that family):

* Map-only where semantics allow: sampling and PII redaction are pure
  per-row codegen (zero shuffle at any scale); packing shuffles ONCE
  on the shard key and then runs an embarrassingly-parallel per-shard
  window; span detection's only shuffles are the gram frequency
  aggregation and the dup-gram equi-join (the inherently cross-row
  steps).
* Token semantics are the corpus-wide FILTERED adjacency: positions
  are assigned after dropping empty tokens (multi-space runs make
  neighbors), matching textdedup's kernels/oracles bit-for-bit.
* Hashes are the shared md5-based :func:`textdedup.hash60_col` so the
  DuckDB oracle reproduces sampling decisions exactly.
* Regexes used on both engines are alternation-free and
  backslash-free (bracket classes only) — Java regex (Spark) and RE2
  (DuckDB) agree on every pattern here; see the r4 gotcha about
  backslash unescaping in shared SQL string literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textdedup import TOKS_EXPR, gram_window_expr, hash60_col, hash60_sql

# ---------------------------------------------------------------------------
# Deterministic stratified sampling (language rebalancing)
# ---------------------------------------------------------------------------
# A 100 TB corpus is rebalanced by downsampling over-represented
# strata.  The keep/drop decision is a pure function of doc_id — no
# RNG, no state, reproducible across runs/partitionings — so the op is
# a zero-shuffle filter that AQE/pushdown can move freely.

SAMPLE_MOD = 1_000_000

# per-language keep rates (parts per SAMPLE_MOD); strata not listed
# keep everything.  en is the over-represented stratum in the fixture.
SAMPLE_RATES: dict[str, int] = {
    "en": 350_000, "de": 750_000, "es": 750_000, "fr": 750_000,
}


def _sample_bucket_col():
    return hash60_col(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))) \
        % SAMPLE_MOD


def stratified_sample(docs: DataFrame,
                      rates: dict[str, int] | None = None) -> DataFrame:
    """Keep doc when ``hash60('smp:'||doc_id) % 1e6 < rate[lang]``.

    Returns the kept rows ``(doc_id, lang, smp_bucket)`` — row-level so
    the oracle value-hash pins every individual keep decision, not just
    the counts.
    """
    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(SAMPLE_MOD)
    for lang, r in rates.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (docs
            .select("doc_id", "lang", _sample_bucket_col().alias("smp_bucket"))
            .filter(F.col("smp_bucket") < rate))


def stratified_sample_sql(rates: dict[str, int] | None = None) -> str:
    rates = SAMPLE_RATES if rates is None else rates
    whens = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in rates.items())
    bucket = hash60_sql("concat('smp:', cast(doc_id as varchar))")
    return f"""
SELECT doc_id, lang, smp_bucket FROM (
  SELECT doc_id, lang, {bucket} % {SAMPLE_MOD} AS smp_bucket,
         CASE {whens} ELSE {SAMPLE_MOD} END AS rate
  FROM documents) q
WHERE smp_bucket < rate
"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------
# The standard pretraining packing: concatenate documents in a fixed
# order and cut the token stream every PACK_BUDGET tokens.  One global
# stream does not scale, so the corpus is sharded by doc_id % N_SHARDS
# and each shard is an independent stream (sequence ids are
# (shard, seq_id) pairs).  Within a shard the cut points fall out of a
# windowed cumulative token count — prefix sums, not a sequential
# fold — so the whole op is one hash shuffle on the shard key plus a
# per-shard sort; at cluster scale N_SHARDS is sized to the executor
# count and every shard packs in parallel.

PACK_BUDGET = 256   # tokens per packed sequence
PACK_SHARDS = 8

_N_TOK = f"size({TOKS_EXPR})"


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   n_shards: int = PACK_SHARDS) -> DataFrame:
    """(shard, seq_id, doc_id, piece_start, piece_len): which slice of
    each document's (filtered) token array lands in which packed
    sequence.  A document longer than ``budget`` spans several
    sequences; zero-token documents are excluded (they contribute no
    tokens to any sequence)."""
    d = (docs.select("doc_id", F.expr(_N_TOK).alias("n_tok"))
         .filter(F.col("n_tok") > 0)
         .withColumn("shard", F.col("doc_id") % n_shards))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("offset", F.sum("n_tok").over(w) - F.col("n_tok"))
    # integer division (not floor of a double quotient): offsets are
    # nonneg int64 and must stay exact past 2^53 tokens per shard
    first = F.expr(f"offset DIV {budget}")
    last = F.expr(f"(offset + n_tok - 1) DIV {budget}")
    d = d.withColumn("seq_id", F.explode(F.sequence(first, last)))
    lo = F.greatest(F.col("offset"), F.col("seq_id") * budget)
    hi = F.least(F.col("offset") + F.col("n_tok"),
                 (F.col("seq_id") + 1) * budget)
    return d.select(
        "shard", "seq_id", "doc_id",
        (lo - F.col("offset")).alias("piece_start"),
        (hi - lo).alias("piece_len"))


def pack_sequences_sql(budget: int = PACK_BUDGET,
                       n_shards: int = PACK_SHARDS) -> str:
    return f"""
WITH sized AS (
  SELECT doc_id, doc_id % {n_shards} AS shard,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
  FROM documents),
placed AS (
  SELECT shard, doc_id, n_tok,
         -- cast: DuckDB sum(bigint) widens to HUGEINT; the arithmetic
         -- below must stay exact int64 like the Spark side
         cast(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) as bigint)
           - n_tok AS doc_offset
  FROM sized WHERE n_tok > 0),
pieces AS (
  SELECT shard, doc_id, n_tok, doc_offset,
         -- integer division (//), matching Spark's DIV: exact int64
         unnest(generate_series(doc_offset // {budget},
                                (doc_offset + n_tok - 1) // {budget}))
           AS seq_id
  FROM placed)
SELECT shard, seq_id, doc_id,
       greatest(doc_offset, seq_id * {budget}) - doc_offset AS piece_start,
       least(doc_offset + n_tok, (seq_id + 1) * {budget})
         - greatest(doc_offset, seq_id * {budget}) AS piece_len
FROM pieces
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Alternation-free, backslash-free patterns (bracket classes only):
# on these, Java regex (leftmost-first greedy + backtracking) and RE2
# (leftmost-longest) produce identical matches, so counts and
# replacements agree across engines.  The fixture corpus carries no
# PII, so the query synthesizes a deterministic contact line per doc
# (same shared expression on both sides) before redacting — the
# replacement path is exercised on every row.

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
IPV4_RE = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"

# shared synthesized page: text + ' contact userN@mail.example.com
# from 10.A.0.B end' (A, B derived from doc_id)
_PAGE_SQL = ("concat(text, ' contact user', cast(doc_id as varchar), "
             "'@mail.example.com from 10.', "
             "cast(doc_id % 250 as varchar), '.0.', "
             "cast(doc_id % 100 as varchar), ' end')")
_PAGE_SPARK = ("concat(text, ' contact user', cast(doc_id as string), "
               "'@mail.example.com from 10.', "
               "cast(doc_id % 250 as string), '.0.', "
               "cast(doc_id % 100 as string), ' end')")


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ips, redacted_md5, redacted_len) — count
    and scrub emails and IPv4s.  Emails are redacted FIRST and n_ips
    is counted on the email-redacted text, so each count equals the
    number of replacement tokens actually present in the redacted
    output — even when a dotted quad sits inside an email (e.g.
    'user@1.2.3.4.com', which EMAIL_RE consumes whole; r5 review).
    Pure per-row codegen: zero shuffle."""
    page = F.expr(_PAGE_SPARK)
    red_email = F.regexp_replace(page, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red_email, IPV4_RE, "[IP]")
    return docs.select(
        "doc_id",
        F.regexp_count(page, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(red_email, F.lit(IPV4_RE)).alias("n_ips"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"))


def pii_redact_sql() -> str:
    return f"""
SELECT doc_id,
       len(regexp_extract_all(page, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(red_email, '{IPV4_RE}')) AS n_ips,
       md5(regexp_replace(red_email, '{IPV4_RE}', '[IP]', 'g'))
         AS redacted_md5,
       length(regexp_replace(red_email, '{IPV4_RE}', '[IP]', 'g'))
         AS redacted_len
FROM (
  SELECT doc_id, page,
         regexp_replace(page, '{EMAIL_RE}', '[EMAIL]', 'g') AS red_email
  FROM (SELECT doc_id, {_PAGE_SQL} AS page FROM documents) q0) q1
"""


# ---------------------------------------------------------------------------
# Duplicate n-gram span detection (bounded exact-substring dedup)
# ---------------------------------------------------------------------------
# Lee et al.-style exact substring dedup at n-gram granularity: any
# word n-gram occurring in >= MIN_DOCS distinct documents marks its
# token span as duplicated; overlapping/adjacent marked spans merge
# into maximal islands per document.  Gram construction is the same
# map-only transform(sequence(...)) as textdedup._gram_arrays (kept
# positional and NON-distinct here — spans need every occurrence);
# island merging is a per-document window (gaps-and-islands), which
# partitions perfectly.  The only shuffles are the gram frequency
# aggregation and the dup-gram equi-join.

SPAN_N = 5
SPAN_MIN_DOCS = 2


def _pos_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, gram): word n-grams WITH their 0-based filtered
    token position, built per row in one codegen pass — the shared
    :func:`textdedup.gram_window_expr` sliding window, kept positional
    and NON-distinct (spans need every occurrence)."""
    return (docs.select("doc_id", F.expr(TOKS_EXPR).alias("toks"))
            .select("doc_id", F.posexplode(F.expr(gram_window_expr(n)))
                    .alias("pos", "gram")))


def dup_ngram_spans(docs: DataFrame, n: int = SPAN_N,
                    min_docs: int = SPAN_MIN_DOCS,
                    cache: list | None = None) -> DataFrame:
    """(doc_id, span_start, span_end, n_hits): maximal merged token
    spans covered by n-grams shared across >= min_docs documents.
    span bounds are inclusive 0-based filtered-token indices; n_hits
    counts the duplicated gram starts inside the span.

    ``cache``: caller-owned persist contract (same as
    textdedup.simhash_near_dup_pairs): the positional gram table feeds
    BOTH the frequency aggregation and the hits join, so without a
    persist the n-fold gram explode runs twice.  When the caller
    supplies a list, the gram frame is persisted and appended for the
    caller to unpersist; when None (the swept path), the plan stays
    pure-lazy to avoid unowned storage."""
    g = _pos_grams(docs, n)
    if cache is not None:
        g = g.persist()
        cache.append(g)
    dup = (g.groupBy("gram")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= min_docs)
           .select("gram"))
    hits = g.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # new island when this gram start is beyond the previous gram's
    # covered range [prev, prev + n - 1] — i.e. gap iff pos > prev + n
    # is false for overlap/adjacency: merge while pos <= prev + n
    flagged = hits.withColumn(
        "new_island",
        F.when(F.lag("pos").over(w).isNull()
               | (F.col("pos") > F.lag("pos").over(w) + n), 1).otherwise(0))
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (islands.groupBy("doc_id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (n - 1)).alias("span_end"),
                 F.count("*").alias("n_hits"))
            .select("doc_id", "span_start", "span_end", "n_hits"))


def dup_ngram_spans_sql(n: int = SPAN_N,
                        min_docs: int = SPAN_MIN_DOCS) -> str:
    leads = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {j}) OVER w" for j in range(1, n)])
    return f"""
WITH pos_words AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1
           AS pos,
         tok
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS raw_pos
    FROM documents) q WHERE tok <> ''),
grams AS (
  SELECT doc_id, pos, gram FROM (
    SELECT doc_id, pos, {leads} AS gram,
           count(*) OVER (PARTITION BY doc_id) AS n_tok
    FROM pos_words
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) q
  WHERE pos <= n_tok - {n}),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {min_docs}),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup d ON g.gram = d.gram),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {n} THEN 1 ELSE 0 END
           AS new_island
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
islands AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged)
SELECT doc_id, min(pos) AS span_start, max(pos) + {n - 1} AS span_end,
       count(*) AS n_hits
FROM islands GROUP BY doc_id, island
"""
