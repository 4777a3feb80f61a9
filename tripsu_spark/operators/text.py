"""Text-analysis operators over the ``documents`` table (training-data
pipeline ops): token counting, quality scoring, language-ID heuristic,
document fingerprinting. All pure Catalyst expressions — single narrow
scan each, no shuffles, no UDFs; each ships its DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

# language -> marker words (heuristic n-gram/stopword language ID;
# ties resolve in this order)
LANG_MARKERS = [
    ("en", ["the", "a", "and", "of", "to"]),
    ("de", ["der", "die", "das", "und", "nicht"]),
    ("es", ["el", "los", "las", "y", "que"]),
    ("fr", ["le", "les", "et", "une", "est"]),
]


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def _count_markers(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct): whitespace + BPE-ish subword count.

    n_bpe approximates a BPE token count as ceil(char_len / 4) summed
    over words — the standard ~4-chars-per-token heuristic, computed
    exactly (and identically) in both engines."""
    toks = _tokens(F.col("text"))
    n_bpe = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"),
    )
    return documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        n_bpe.alias("n_bpe"),
    )


def token_count_oracle() -> str:
    return """
SELECT doc_id,
  CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS BIGINT) AS n_distinct,
  CAST(list_aggregate(list_transform(string_split_regex(lower(text), '\\s+'),
       t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS n_bpe
FROM documents
"""


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, quality): 0.4*distinct-token ratio + 0.3*stopword hit
    ratio + 0.3*length saturation(min(n_tokens/100, 1))."""
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = _count_markers(F.col("text"), STOPWORDS) / n
    length_sat = F.least(n / 100.0, F.lit(1.0))
    score = F.round(0.4 * distinct_ratio + 0.3 * stop_ratio + 0.3 * length_sat, 6)
    return documents.select("doc_id", score.alias("quality"))


def quality_score_oracle() -> str:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return f"""
SELECT doc_id, ROUND(
    0.4 * (len(list_distinct(string_split_regex(lower(text), '\\s+')))
           / CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE))
  + 0.3 * (len(regexp_extract_all(lower(text), '{pat}'))
           / CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE))
  + 0.3 * least(len(string_split_regex(lower(text), '\\s+')) / 100.0, 1.0)
, 6) AS quality
FROM documents
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_actual): marker-word language guess
    next to the table's labeled lang for eyeballing accuracy."""
    counts = {lang: _count_markers(F.col("text"), w) for lang, w in LANG_MARKERS}
    names = [lang for lang, _ in LANG_MARKERS]
    # argmax with first-in-list-wins tiebreak, mirrored 1:1 in the
    # oracle CASE: lang wins if cnt>0 and cnt strictly beats all
    # EARLIER languages (earlier ones were already given the chance).
    pred = None
    for i, lang in enumerate(names):
        cond = counts[lang] > 0
        for prev in names[:i]:
            cond = cond & (counts[lang] > counts[prev])
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return documents.select(
        "doc_id", pred.alias("lang_pred"), F.col("lang").alias("lang_actual")
    )


def lang_id_oracle() -> str:
    cases = []
    names = [lang for lang, _ in LANG_MARKERS]
    cnt_sql = {
        lang: f"len(regexp_extract_all(lower(text), '\\b({'|'.join(w)})\\b'))"
        for lang, w in LANG_MARKERS
    }
    for i, lang in enumerate(names):
        conds = [f"{cnt_sql[lang]} > 0"]
        for prev in names[:i]:
            conds.append(f"{cnt_sql[lang]} > {cnt_sql[prev]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"SELECT doc_id, {case} AS lang_pred, lang AS lang_actual FROM documents"


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 over the sorted distinct token set —
    an order-insensitive content fingerprint (near-dup prefilter)."""
    toks = _tokens(F.col("text"))
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return documents.select("doc_id", fp.alias("fingerprint"))


def doc_fingerprint_oracle() -> str:
    return """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(
      string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint
FROM documents
"""


def normalize_text(documents: DataFrame) -> DataFrame:
    """(doc_id, norm_text): canonical form for content hashing —
    lowercase, punctuation stripped to spaces, whitespace collapsed,
    trimmed. Deduplication pipelines normalize BEFORE digesting so
    cosmetic variants (case, spacing, punctuation) collapse to one
    cluster; compose as dedup_exact-over-normalize. Pure Catalyst
    (two regexp_replace + lower + trim), shuffle-free."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    return documents.select("doc_id", norm.alias("norm_text"))


def normalize_text_oracle() -> str:
    return r"""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
       '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


# PII patterns, deliberately restricted to syntax both Java regex
# (Spark) and RE2 (DuckDB) interpret identically: character classes,
# bounded repetition, alternation, \b — no lookaround, no
# backreferences. Applied in THIS order (emails before phones so the
# phone pattern can't eat an address's digits; IPs before phones for
# the same reason).
#
# The phone pattern is three alternated shapes, precision-first (an
# over-broad digit-run pattern silently corrupts dates/decimals/IDs in
# training text — round-4 advice verified '2026-08-17', '3.14159265',
# '1914-1918' and 'order id 12345678' all matched the old
# one-separator-class form, and '911. 2019' fused across a sentence
# boundary):
#   1. +international: an explicit '+' anchors it, so digits/short
#      separators after it are unambiguous (covers '+1 (415) 555-0133',
#      '+41 79 555 12 34').
#   2. NANP 3-3-4 with at most ONE of [ .-] between groups and word
#      boundaries at both ends ('415-555-0133', '(415) 555-0133') —
#      dates (8 digits, 4-2-2) and decimals can't align to it. The
#      separators are individually OPTIONAL, so a bare EXACTLY-10-digit
#      standalone run ('4155550133') also matches and is redacted —
#      intended: an unseparated 10-digit token in prose is
#      overwhelmingly a NANP number. The accepted collateral is
#      10-digit numeric IDs/unix timestamps ('1723900000'); runs of
#      any OTHER length without separators (8, 9, 11, 12 digits …) are
#      left alone (pinned in tests/test_text_similarity.py).
#   3. dash-grouped 2/4-3/4-3/4 ('020-7946-0958'); a yyyy-mm-dd date
#      fails its {3,4} middle group.
# Known recall loss, accepted for precision: digit runs of length != 10
# and space-separated groups WITHOUT a leading '+' are left alone.
PHONE_PATTERN = (
    r"\+[0-9](?:[ ().-]{0,2}[0-9]){6,14}"
    r"|\(?\b[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b"
    r"|\b[0-9]{2,4}-[0-9]{3,4}-[0-9]{3,4}\b"
)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
]


def pii_scrub_exprs() -> tuple[Column, list[Column]]:
    """(scrubbed_text_expr, [n_<category> count exprs]) over ``text`` —
    the column-level building blocks of ``scrub_pii``, reusable in any
    projection (incl. streaming plans, where per-row joins are not an
    option and composition must happen in one select)."""
    scrubbed: Column = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, counts


def _max_multiplicity(toks: Column) -> Column:
    """Count of the most frequent element, as the max run length of the
    SORTED array via one fold — O(n log n) per document, replacing the
    old ``transform(array_distinct, d -> size(filter(toks, =d)))`` form
    that was O(distinct × n) (quadratic on high-diversity documents;
    it benched ~20× slower than the sibling text ops, BENCH_OPS_r04).
    Still a pure expression, so it composes into streaming projections.

    The fold state is (prev, run, best); the "" sentinel for prev is
    safe even when the first token IS "" — then run+1 = 0+1 = 1, the
    same value the fresh-run branch assigns."""
    run_next = lambda acc, t: (  # noqa: E731
        F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
    )
    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            run_next(acc, t).alias("run"),
            F.greatest(acc["best"], run_next(acc, t)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_exprs() -> tuple[Column, Column]:
    """(dup_bigram_frac, top_token_frac) expressions over ``text`` —
    the column-level building blocks of ``repetition_metrics``."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    dup_frac = F.when(n < 2, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(bigrams)) / (n - 1).cast("double")
    )
    top_frac = F.when(n < 1, F.lit(0.0)).otherwise(
        _max_multiplicity(toks) / n.cast("double")
    )
    return F.round(dup_frac, 6), F.round(top_frac, 6)


def scrub_pii(documents: DataFrame) -> DataFrame:
    """(doc_id, scrubbed, n_email, n_ipv4, n_phone): redact emails,
    IPv4 addresses and phone numbers (precision-first shapes, see
    PHONE_PATTERN — dates/decimals/IDs survive) with typed placeholders.
    Each category is counted on the text AFTER the earlier categories
    were already replaced, so counts equal what that category actually
    redacted (an IP is not double-counted as a phone; the placeholders
    contain no digits, so they can never re-match).

    The natural companion to the pseudonymization core: rules.yaml
    governs structured IRIs/literals, this governs free text before it
    enters a training mix. Pure Catalyst (sequential regexp_replace +
    regexp_extract_all), shuffle-free, single narrow scan — the same
    cost shape as normalize_text at any corpus size.
    """
    scrubbed, counts = pii_scrub_exprs()
    return documents.select("doc_id", scrubbed.alias("scrubbed"), *counts)


def scrub_pii_oracle() -> str:
    scrub = "text"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({scrub}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {scrub} AS scrubbed, {', '.join(counts)} FROM documents"


def repetition_metrics(documents: DataFrame) -> DataFrame:
    """(doc_id, dup_bigram_frac, top_token_frac): Gopher-style
    repetition quality signals — the fraction of word bigrams that are
    duplicates (1 - distinct/total) and the share of the single most
    frequent token. High values flag boilerplate/spam for filtering.

    Pure Catalyst via higher-order array functions; the top-token count
    is a sort + max-run-length fold (O(n log n) per document, see
    ``_max_multiplicity``) — per-document work, embarrassingly
    parallel, no shuffle. The oracle computes the same count the
    relational way (unnest → group → max), which is what you'd also do
    on Spark if a corpus ever made per-row sorting the bottleneck.
    """
    dup_frac, top_frac = repetition_exprs()
    return documents.select(
        "doc_id",
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_token_frac"),
    )


def repetition_metrics_oracle() -> str:
    toks = r"string_split_regex(lower(d.text), '\s+')"
    bigrams = (
        f"list_transform(range(1, len({toks})), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1])"
    )
    # linear top-count via unnest -> group -> max (the relational twin
    # of the Spark side's sorted max-run-length fold); every document
    # has >= 1 token (split of '' is ['']), so the join never misses
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
  FROM documents
), topc AS (
  SELECT doc_id, max(c) AS top_cnt
  FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t)
  GROUP BY doc_id
)
SELECT d.doc_id,
  ROUND(CASE WHEN len({toks}) < 2 THEN 0.0
        ELSE 1.0 - len(list_distinct({bigrams}))
                   / CAST(len({toks}) - 1 AS DOUBLE) END, 6) AS dup_bigram_frac,
  ROUND(CASE WHEN len({toks}) < 1 THEN 0.0
        ELSE topc.top_cnt / CAST(len({toks}) AS DOUBLE) END, 6) AS top_token_frac
FROM documents d JOIN topc ON d.doc_id = topc.doc_id
"""
