"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All hot-path logic is JVM-side ``pyspark.sql.functions`` expressions (no
Python UDFs) so plans stay inside whole-stage codegen and the same formulas
are expressible as ANSI SQL for the DuckDB oracle (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic heuristic stopword lists (ASCII only, fixed order)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "para", "con"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of trimmed text ('' -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-ish token estimate: word pieces of <=4 chars via a regex
    split (proxy for BPE segmentation; deterministic, SQL-expressible)."""
    # each word contributes ceil(len/4) pieces
    toks = tokens_col(text)
    return F.aggregate(
        toks, F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"))


def stopword_count(text: Column, lang: str) -> Column:
    toks = tokens_col(F.lower(text))
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))


def quality_score(text: Column) -> Column:
    """Deterministic quality in [0,1]: length saturation + stopword ratio +
    punctuation presence (the reference's text/link-density family of
    heuristics, generalized — SURVEY.md §2.4 A1/A5)."""
    n_tok = token_count(text)
    stop = stopword_count(text, "en")
    punct = punct_count(text)
    len_part = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_part = F.least(stop / F.greatest(n_tok.cast("double"),
                                          F.lit(1.0)) * 5.0, F.lit(1.0))
    punct_part = F.least(punct / F.lit(10.0), F.lit(1.0))
    return F.round(0.5 * len_part + 0.3 * stop_part + 0.2 * punct_part, 6)


def lang_scores(text: Column) -> dict:
    return {lang: stopword_count(text, lang) for lang in LANG_ORDER}


def lang_guess(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties resolved by LANG_ORDER;
    'und' (undetermined) when no stopwords hit at all."""
    scores = lang_scores(text)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def normalize_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: first 16 hex chars of md5(normalized text)."""
    return F.substring(F.md5(normalize_text(text)), 1, 16)


ROLLING_BASE = 131
ROLLING_MOD = 1_000_000_007


def fingerprint_rolling(text: Column) -> Column:
    """Polynomial rolling hash over the character codes of the normalized
    text: acc = (acc*131 + ascii(ch)) mod 1e9+7 — pure expression (F.aggregate
    over the char array), no Python."""
    chars = F.split(normalize_text(text), "")
    codes = F.filter(chars, lambda c: c != "")
    return F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD)


def text_stats(documents: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document text-analysis projection (one pass, no shuffle)."""
    t = F.col(text_col)
    return documents.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subwords"),
        punct_count(t).alias("n_punct"),
        stopword_count(t, "en").alias("n_stop_en"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        fingerprint_md5(t).alias("fp_md5"),
        fingerprint_rolling(t).alias("fp_roll"),
    )


# PII redaction — regexes chosen to behave IDENTICALLY under Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, and \b
# only; no lookarounds (RE2 has none).  Applied in tuple order.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(text: Column) -> Column:
    """Redact emails, IPv4s, and phone numbers (in PII_PATTERNS order —
    IPs before phones so dotted phone-alikes inside IPs are gone first).
    Pure chained regexp_replace: zero shuffle, whole-stage codegen."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind ('email' | 'ip' | 'phone') in the
    ORIGINAL text."""
    pats = {k: p for k, p, _ in PII_PATTERNS}
    return F.regexp_count(text, F.lit(pats[kind]))


def repetition_stats(documents: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """(doc_id, n_ngrams, top_ngram_frac, uniq_ngram_frac) — word-n-gram
    repetition signals (the Gopher-style quality filters: a doc whose
    most frequent 2-gram carries a large share of all 2-grams, or whose
    distinct share is low, is boilerplate/spam-repetitive).

    One shuffle keyed (doc, gram) with map-side partial counts, then a
    per-doc aggregate — both combinable, no per-doc data skew beyond doc
    length.  Tokenization matches the dedup shingle normalization
    (lowercase, non-alphanumerics stripped), so the SQL oracle shares the
    corpus's token expression.  Docs with fewer than ``n`` tokens report
    0 n-grams and 0.0 fractions."""
    toks = F.split(F.trim(F.regexp_replace(
        F.lower(F.col(text_col)), r"[^a-z0-9 ]", " ")), r"\s+")
    d = documents.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    grams = d.select(
        "doc_id",
        F.explode(F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
        ).otherwise(F.array().cast("array<string>"))).alias("gram"))
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("c"))
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_ngrams"),
        F.max("c").alias("_mx"),
        F.count(F.lit(1)).alias("_uniq"))
    ids = documents.select(F.col(id_col).alias("doc_id")).distinct()
    return (ids.join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                    F.round(F.coalesce(F.col("_mx") / F.col("n_ngrams"),
                                       F.lit(0.0)), 6)
                    .alias("top_ngram_frac"),
                    F.round(F.coalesce(F.col("_uniq") / F.col("n_ngrams"),
                                       F.lit(0.0)), 6)
                    .alias("uniq_ngram_frac")))


def chunk_windows(documents: DataFrame, window_tokens: int = 512,
                  stride: int | None = None, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size (optionally overlapping) token
    windows — the context-window chunking step of a pretraining /
    retrieval pipeline.  One row per (doc, window):
    ``(doc_id, chunk_id, start_tok, n_tok, chunk_text)``.

    Windows start at 0 and every ``stride`` tokens after (default:
    ``window_tokens`` — non-overlapping), while the start is inside the
    document; each takes ``window_tokens`` tokens or whatever remains, so
    tail windows are short and a doc shorter than one window yields one
    chunk (the standard sliding-window convention — trailing windows
    already covered by their predecessor's range ARE emitted).
    Tokenization is raw whitespace splitting (case/punctuation
    preserved — chunking must not alter content); chunk_text re-joins
    with single spaces, so only inter-token whitespace is canonicalized.
    NULL ids and whitespace-only docs are excluded.

    Pure projection + explode — ZERO shuffle at any corpus size; the
    fan-out is bounded by ~n_tokens/stride rows per doc."""
    stride = window_tokens if stride is None else stride
    if window_tokens <= 0 or stride <= 0:
        raise ValueError(
            f"window_tokens and stride must be positive, got "
            f"{window_tokens}/{stride}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = (documents
         .where(F.col(id_col).isNotNull()
                & (F.length(F.trim(F.col(text_col))) > 0))
         .select(F.col(id_col).alias("doc_id"), toks.alias("_toks")))
    d = d.withColumn(
        "start_tok",
        F.explode(F.sequence(F.lit(0), F.size("_toks") - 1,
                             F.lit(stride))))
    chunk = F.slice("_toks", F.col("start_tok") + 1, window_tokens)
    return d.select(
        "doc_id",
        F.expr(f"start_tok div {stride}").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.concat_ws(" ", chunk).alias("chunk_text"))


def tfidf_top_terms(documents: DataFrame, k: int = 5,
                    scale: int = 10 ** 6, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` characteristic terms per document by INTEGER-surrogate
    TF-IDF: ``score = tf · ((scale·N) div df)`` where N = corpus docs
    with ≥1 token and df = docs containing the term.  The idf surrogate
    ``(scale·N) div df`` is strictly monotone in N/df — same ranking
    family as log-idf for fixed tf — and all-integer, so scores are
    bit-exact in any engine (float log idf differs in ulps per libm and
    can't be value-hashed cross-engine).  Tokens are lowercased
    whitespace words.

    Scale shape: one (doc, term) count shuffle, one term-keyed df
    aggregate (vocabulary-scale — tiny next to the corpus), the N total
    rides in as a broadcast 1-row frame (no driver collect), and the
    top-k window partitions BY DOC — per-partition heaps, no global
    sort.  Ties break deterministically (score desc, term asc).

    Returns (doc_id, term, tf:long, df:long, score:long, rank:int)."""
    from pyspark.sql import Window
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = (documents
            .where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.lower(F.col(text_col))))
                    .alias("term")))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                             F.col("term").asc())
    return (tf.join(df_, "term")
            .crossJoin(F.broadcast(n))
            .withColumn("score",
                        (F.col("tf")
                         * F.expr(f"{scale} * n_docs div df"))
                        .cast("long"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score", "rank"))


def bm25_topk(documents: DataFrame, query_terms: list[str], k: int = 10,
              iscale: int = 10 ** 6, pscale: int = 10 ** 6,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by INTEGER-surrogate
    BM25 (Robertson/Spärck Jones; k1=6/5, b=3/4 — the standard 1.2/0.75
    as exact rationals).  Per (term, doc):

        tf_part = (pscale · (k1+1) · tf · A) div (tf·A + k1·((1-b)·A + b·dl·N))
                = (pscale · 44·tf·A) div (20·tf·A + 6·A + 18·dl·N)
        idf     = (iscale · (2·(N-df)+1)) div (2·df+1)      # (N-df+.5)/(df+.5)
        score   = Σ_terms idf · tf_part

    with N = docs with ≥1 token, A = total corpus tokens (avgdl = A/N
    multiplied through), dl = doc length, df = docs containing the term.
    The idf surrogate is the exact Robertson ratio scaled to int64 (the
    log is monotone, so top-k ranking is preserved for single-term
    contributions and the float-free scores value-hash cross-engine);
    int64 headroom: the binding term is the tf_part numerator
    pscale·44·tf·A < 9.2·10¹⁸, i.e. tf·A ≲ 2·10¹¹ at pscale=10⁶ — drop
    ``pscale`` a decade per 10× corpus tokens beyond (ANSI mode makes an
    overflow loud, not silent).

    Scale shape: one (doc,term) count shuffle restricted to the query
    terms (the filter pushes below the explode-aggregate), doc lengths
    as a doc-keyed aggregate, the query-term dfs and the (N, A) totals
    ride in as broadcast tiny frames, and the global top-k is
    sort+limit — TakeOrdered, no single-partition window over the
    corpus.  Ties break deterministically (score desc, doc_id asc).

    Returns (doc_id, score:long, n_hit:long, rank:int)."""
    from pyspark.sql import Window
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = (documents
            .where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.lower(F.col(text_col))))
                    .alias("term")))
    dl = (toks.groupBy("doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("dl")))
    tot = dl.agg(F.sum("dl").cast("long").alias("a_total"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"))
    tf = (toks.where(F.col("term").isin(terms))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = (tf.groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("df")))
    scored = (tf.join(F.broadcast(df_), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(tot))
              .withColumn(
                  "contrib",
                  F.expr(f"(({iscale} * (2 * (n_docs - df) + 1))"
                         f" div (2 * df + 1))")
                  * F.expr(f"({pscale} * 44 * tf * a_total) div "
                           "(20 * tf * a_total + 6 * a_total"
                           " + 18 * dl * n_docs)"))
              .groupBy("doc_id")
              .agg(F.sum("contrib").cast("long").alias("score"),
                   F.count(F.lit(1)).cast("long").alias("n_hit")))
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()) \
                .limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def _deletion_variants(col: Column) -> Column:
    """The string plus every single-character deletion of it — the
    SymSpell deletion neighborhood D1 (Garbe 2012).  Pure expressions:
    one array build per string, |s|+1 variants."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(col.substr(F.lit(1), i - 1),
                               col.substr(i + 1, F.length(col)))))


def fuzzy_token_match(documents: DataFrame, aliases: DataFrame,
                      max_len: int = 20, text_col: str = "text",
                      alias_col: str = "alias") -> DataFrame:
    """Edit-distance-≤1 matches between distinct corpus tokens and an
    alias dictionary — misspelled-mention detection for entity linking
    (the fuzzy complement of the exact mention automaton).

    Scale design — the naive form is a tokens×aliases cross join with a
    levenshtein predicate (O(n·m) distances; Catalyst runs it as a
    BroadcastNestedLoop).  This uses the SymSpell deletion-neighborhood
    trick instead: lev(a,b) ≤ 1 ⟹ D1(a) ∩ D1(b) ≠ ∅ where D1(s) is s
    plus its single-char deletions, so exploding BOTH sides to their
    variants turns candidate generation into an EQUI-join on the variant
    string (the intersection test), followed by a levenshtein ≤ 1 verify
    on the distinct candidate pairs only (the implication is one-way:
    e.g. 'ab'/'ba' share deletions at distance 2 — verification is what
    makes it exact).  Explode volume is Σ(|token|+1) ≤ (max_len+1)·n —
    linear in the corpus; the alias side is vocabulary-scale and
    broadcasts.  ``max_len`` bounds the per-token fan-out (a token
    longer than every alias by ≥2 can't match at distance 1 anyway).

    Both Spark and DuckDB implement classic Levenshtein (unit-cost
    insert/delete/substitute), so distances value-hash cross-engine.

    Returns (token, alias, dist:int) for lev ≤ 1, distance-0 self-hits
    included."""
    toks = (documents
            .select(F.explode(tokens_col(F.lower(F.col(text_col))))
                    .alias("token"))
            .where((F.length("token") >= 2)
                   & (F.length("token") <= max_len))
            .distinct())
    tvar = toks.select(
        "token", F.explode(_deletion_variants(F.col("token"))).alias("_v"))
    avar = (aliases
            .select(F.lower(F.col(alias_col)).alias("alias")).distinct()
            .select("alias",
                    F.explode(_deletion_variants(F.col("alias")))
                    .alias("_v")))
    cands = (tvar.join(F.broadcast(avar), "_v")
             .select("token", "alias").distinct())
    return (cands
            .withColumn("dist", F.levenshtein("token", "alias"))
            .where(F.col("dist") <= 1))


def ngram_counts(documents: DataFrame, n: int = 3, min_count: int = 2,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide word n-gram count table with count-threshold pruning —
    the KenLM-style LM-counts product (and the count-merge step of BPE-
    family vocabulary induction).  Tokens are lowercased whitespace
    words; occurrences count WITH multiplicity (an LM count table, not a
    document-frequency table — that's shingles+_df_cut's job).

    Scale shape: explode to ~n_tokens rows/doc, ONE n-gram-keyed
    aggregate with map-side combine, and the ``min_count`` prune keeps
    only the Zipf head — the classic pruned-counts trick that bounds LM
    table size at any corpus scale.  Pure expressions, no UDFs.

    Returns (ngram, n_occurrences:long) for counts >= min_count."""
    if n < 1 or min_count < 1:
        raise ValueError(
            f"need n >= 1 and min_count >= 1, got n={n}/{min_count}")
    toks = tokens_col(F.lower(F.col(text_col)))
    d = (documents.where(F.col(id_col).isNotNull())
         .select(toks.alias("_toks"))
         .where(F.size("_toks") >= n))
    grams = d.select(
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n))))
        .alias("ngram"))
    return (grams.groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count))


def lm_coverage(documents: DataFrame, n: int = 3, min_count: int = 2,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document LM-head coverage — the cheap stand-in for KenLM
    perplexity filtering (CCNet-style: documents whose n-grams the
    corpus LM has never seen are noise candidates): of the doc's n-gram
    OCCURRENCES (with multiplicity), the share that appears in the
    PRUNED corpus count table (``ngram_counts`` — counts >= min_count,
    the Zipf head; a doc's own repeats count toward the threshold,
    exactly as they would in a corpus-trained pruned LM).

    Scale shape: the head table is the bounded Zipf head, so the
    gram↔head equi-join broadcasts when small and shuffles on the ngram
    key otherwise (AQE's call); the per-doc aggregate is map-side
    combinable; integer basis points, no floats anywhere.

    Returns (doc_id, n_ngrams:long, n_in_head:long, coverage_bp:long)
    for every non-NULL doc_id; docs with fewer than ``n`` tokens get
    0/0 with NULL coverage_bp."""
    head = ngram_counts(documents, n, min_count, text_col, id_col) \
        .select("ngram", F.lit(1).alias("_hit"))
    toks = tokens_col(F.lower(F.col(text_col)))
    d = (documents.where(F.col(id_col).isNotNull())
         .select(F.col(id_col).alias("doc_id"), toks.alias("_toks")))
    grams = (d.where(F.size("_toks") >= n)
             .select("doc_id",
                     F.explode(F.transform(
                         F.sequence(F.lit(0), F.size("_toks") - n),
                         lambda i: F.concat_ws(
                             " ", F.slice("_toks", i + 1, n))))
                     .alias("ngram")))
    per = (grams.join(head, "ngram", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_ngrams"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                .cast("long").alias("n_in_head")))
    return (d.select("doc_id").join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_ngrams", F.lit(0)).cast("long")
                    .alias("n_ngrams"),
                    F.coalesce("n_in_head", F.lit(0)).cast("long")
                    .alias("n_in_head"),
                    F.when(F.col("n_ngrams") > 0,
                           F.expr("(10000 * n_in_head) div n_ngrams"))
                    .cast("long").alias("coverage_bp")))


def tfidf_cosine_pairs(documents: DataFrame, threshold_num: int = 1,
                       threshold_den: int = 2, df_cut: int | None = None,
                       scale: int = 10 ** 3, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """All-pairs TF-IDF cosine similarity join above a RATIONAL threshold
    — the weighted-vector twin of the Jaccard pair joins (near-duplicate
    and related-document mining over sparse term vectors; the inverted-
    index + threshold shape of DIMSUM, Zadeh & Carlsson 2013, minus the
    sampling — candidates come only from shared terms, never all pairs).

    Weights are the integer TF-IDF surrogate of ``tfidf_top_terms``:
    w(d,t) = tf · ((scale·N) div df) over the df-pruned vocabulary; with
    ``df_cut`` set, terms in more than df_cut docs are dropped BEFORE
    weights and norms (the standard stop-term cut — a term in m docs fans
    out m² candidate pairs, so the cut bounds join volume; cosines are
    then "over the pruned vocabulary", and the oracle mirrors exactly
    that).  The threshold test is exact integer arithmetic:

        keep  iff  (den·dot)² ≥ (num²·‖a‖²)·‖b‖²

    compared in decimal(38,0) (DuckDB mirrors with HUGEINT) — no square
    roots, no floats, value-hashable cross-engine.  Bounds: dot and the
    squared norms must fit int64, i.e. tf·scale·N ≲ 3·10⁹·√terms; at
    larger corpora lower ``scale`` (the ranking family is unchanged) —
    ANSI mode raises loudly on overflow rather than wrapping.

    Scale shape: one (doc, term) count shuffle, a vocabulary-scale df
    aggregate, the N total broadcast as a 1-row frame, ONE term-keyed
    self-join (inverted index) reduced by groupBy(id_a, id_b) with
    map-side partial sums, then two doc-keyed norm joins.  No windows,
    no cartesian, no driver collects.

    Returns (id_a, id_b, dot, norm_a, norm_b) with id_a < id_b."""
    if threshold_num < 0 or threshold_den <= 0:
        raise ValueError("threshold must be a non-negative rational")
    toks = (documents
            .where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.lower(F.col(text_col))))
                    .alias("term")))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if df_cut is not None:
        dfx = dfx.where(F.col("df") <= df_cut)
    n = tf.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    w = (tf.join(dfx, "term").crossJoin(F.broadcast(n))
         .select("doc_id", "term",
                 (F.col("tf") * F.expr(f"{scale} * n_docs div df"))
                 .cast("long").alias("w")))
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w"))
                                    .cast("long").alias("norm2"))
    a = w.select(F.col("doc_id").alias("id_a"), "term",
                 F.col("w").alias("w_a"))
    b = w.select(F.col("doc_id").alias("id_b"), "term",
                 F.col("w").alias("w_b"))
    dots = (a.join(b, "term")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("w_a") * F.col("w_b"))
                 .cast("long").alias("dot")))
    lhs = (F.col("dot") * F.lit(threshold_den)).cast("decimal(19,0)")
    rhs_a = (F.col("norm_a")
             * F.lit(threshold_num * threshold_num)).cast("decimal(19,0)")
    return (dots
            .join(norms.select(F.col("doc_id").alias("id_a"),
                               F.col("norm2").alias("norm_a")), "id_a")
            .join(norms.select(F.col("doc_id").alias("id_b"),
                               F.col("norm2").alias("norm_b")), "id_b")
            .where(lhs * lhs >= rhs_a * F.col("norm_b").cast("decimal(19,0)"))
            .select("id_a", "id_b", "dot", "norm_a", "norm_b"))


# BPE vocabulary induction ---------------------------------------------------

BPE_SEP = "\x1f"  # unit separator: cannot appear in whitespace-tokenized
                  # text, so symbol boundaries are unambiguous


def _bpe_wrap(word: Column) -> Column:
    """Word → wrapped symbol string: each initial symbol (character)
    individually fenced, '␟a␟␟b␟' for "ab".  With EVERY symbol carrying
    its own boundary pair, the round merge (x, y) → xy is a plain
    left-to-right non-overlapping string replace of '␟x␟␟y␟' by '␟xy␟' —
    greedy BPE merge semantics exactly, with no false prefix matches
    inside longer symbols (both Java's replace and DuckDB's replace scan
    left-to-right over non-overlapping occurrences, so the two engines
    tokenize identically)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(F.lit(BPE_SEP),
                    F.array_join(chars, BPE_SEP + BPE_SEP),
                    F.lit(BPE_SEP))


def _bpe_syms(wrapped: Column) -> Column:
    return F.split(F.regexp_replace(wrapped, f"^{BPE_SEP}|{BPE_SEP}$", ""),
                   BPE_SEP + BPE_SEP)


def bpe_learn(documents: DataFrame, n_merges: int = 8,
              text_col: str = "text", id_col: str = "doc_id"):
    """Byte-pair-encoding vocabulary induction (Sennrich ACL'16 word-level
    BPE): learn ``n_merges`` merges over the corpus, greedily taking the
    most frequent adjacent symbol pair each round (frequency-weighted by
    word counts; ties pinned by (pair) lexicographic order, so the learned
    vocabulary is deterministic and engine-reproducible).

    Returns ``(vocab_df, merges)``: the tokenized word vocabulary
    (word, freq, n_tokens, tokens — space-joined symbols) after all
    merges, and the merge table [(round, x, y, count)].

    Scale shape — the classic BPE trick made distributed: pair counting
    and merging run over the DISTINCT-WORD vocabulary weighted by word
    frequency (vocab ≪ corpus by orders of magnitude), reduced from the
    corpus by ONE groupBy(word).  Each round is one vocabulary-scale pair
    aggregate (map-side combinable) plus a 1-ROW driver argmax — the
    sequential driver dependency is inherent to BPE (round r's counts
    depend on round r-1's merge), and what rides the driver is one
    (x, y, count) row per round, never data.  The merge itself is a pure
    per-row string replace (zero shuffle).  The vocab frame is cached and
    localCheckpoint-truncated every few rounds so lineage stays flat.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = (documents
             .where(F.col(id_col).isNotNull())
             .select(F.explode(tokens_col(F.lower(F.col(text_col))))
                     .alias("word"))
             .where((F.col("word") != "")
                    & ~F.col("word").contains(BPE_SEP))
             .groupBy("word")
             .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    vocab = words.select("word", "freq",
                         _bpe_wrap(F.col("word")).alias("wrapped"))
    vocab = vocab.persist()
    merges = []
    for r in range(1, n_merges + 1):
        syms = _bpe_syms(F.col("wrapped"))
        pairs = (vocab
                 .select("freq", syms.alias("s"))
                 .where(F.size("s") >= 2)
                 .select("freq", F.explode(F.transform(
                     F.sequence(F.lit(0), F.size("s") - 2),
                     lambda i: F.struct(
                         F.get(F.col("s"), i).alias("x"),
                         F.get(F.col("s"), i + 1).alias("y"))))
                     .alias("p"))
                 .groupBy("p.x", "p.y")
                 .agg(F.sum("freq").alias("c")))
        best = pairs.orderBy(F.col("c").desc(), F.col("x").asc(),
                             F.col("y").asc()).limit(1).collect()
        if not best:
            break
        x, y, c = best[0]["x"], best[0]["y"], int(best[0]["c"])
        merges.append((r, x, y, c))
        pat = F.lit(f"{BPE_SEP}{x}{BPE_SEP}{BPE_SEP}{y}{BPE_SEP}")
        rep = F.lit(f"{BPE_SEP}{x}{y}{BPE_SEP}")
        nxt = vocab.select("word", "freq",
                           F.replace(F.col("wrapped"), pat, rep)
                           .alias("wrapped"))
        # eager checkpoint EVERY round: the vocab frame is tiny (distinct
        # words), and anything lazy here re-derives the whole merge chain
        # from round 0 on each subsequent argmax (measured: 223 s → ~20 s
        # at 12 merges on sf0.01)
        nxt = nxt.localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    syms = _bpe_syms(F.col("wrapped"))
    out = vocab.select("word", "freq",
                       F.size(syms).cast("int").alias("n_tokens"),
                       F.array_join(syms, " ").alias("tokens"))
    return out, merges


def bpe_encode(documents: DataFrame, merges,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a LEARNED merge list to a corpus — the tokenizer-APPLICATION
    half of BPE (bpe_learn trains; this tokenizes, typically with a
    vocabulary trained on a different/smaller slice).  OOV handling falls
    out of the construction: an unseen word starts fully character-split
    and each merge rewrites it only where the pair occurs, exactly the
    inference rule of Sennrich ACL'16 word-level BPE.

    ``merges`` is bpe_learn's merge table ((round, x, y, count) or bare
    (x, y) pairs), applied IN ORDER.  Returns (doc_id, n_words,
    n_tokens): whitespace word count and post-BPE token count per
    document (documents with no tokenizable words produce no row,
    mirroring bpe_learn's word filter).

    100 TB shape: token lengths are computed over DISTINCT words (vocab ≪
    corpus, reduced by one groupBy), and — unlike learning, which is
    inherently one job per round — the whole merge chain is ONE
    projection of len(merges) chained replaces, because the merges are
    already known literals.  One word-keyed join back to the per-doc word
    counts (AQE broadcasts the vocab side) and one per-doc sum finish it;
    per-doc token counts never materialize the token strings."""
    wcounts = (documents
               .where(F.col(id_col).isNotNull())
               .select(F.col(id_col).alias("_doc"),
                       F.explode(tokens_col(F.lower(F.col(text_col))))
                       .alias("word"))
               .where((F.col("word") != "")
                      & ~F.col("word").contains(BPE_SEP))
               .groupBy("_doc", "word")
               .agg(F.count(F.lit(1)).cast("long").alias("k")))
    wrapped = _bpe_wrap(F.col("word"))
    for m in merges:
        x, y = (m[1], m[2]) if len(m) == 4 else (m[0], m[1])
        wrapped = F.replace(
            wrapped, F.lit(f"{BPE_SEP}{x}{BPE_SEP}{BPE_SEP}{y}{BPE_SEP}"),
            F.lit(f"{BPE_SEP}{x}{y}{BPE_SEP}"))
    toks = (wcounts.select("word").distinct()
            .select("word", F.size(_bpe_syms(wrapped)).cast("long")
                    .alias("nt")))
    return (wcounts.join(toks, "word")
            .groupBy(F.col("_doc").alias(id_col))
            .agg(F.sum("k").cast("long").alias("n_words"),
                 F.sum(F.col("k") * F.col("nt")).cast("long")
                 .alias("n_tokens")))


_SOUNDEX_TO = "01230120022455012623010202"  # a..z -> digit class


def phonetic_key(word: Column) -> Column:
    """SOUNDEX-family phonetic blocking code (Russell/Odell; the classic
    ER blocking key for names and noisy surface forms): first letter +
    three consonant-class digits.  Classic American Soundex semantics —
    h/w are transparent (removed from the tail BEFORE coding, so letters
    they separate still merge: ashcraft→A261), vowels separate (tymczak
    →T522), and letters coded like the first letter collapse into it
    (pfister→P236).

    Built from translate + anchored regexp_replace chains in the
    Java∩RE2 dialect (NO backreferences — run-collapse is one replace
    per digit class), so a SQL engine reproduces the code CHARACTER FOR
    CHARACTER (the pii_scrub portability discipline).  Words with no
    letters code to NULL."""
    w = F.regexp_replace(F.lower(word), "[^a-z]", "")
    first = F.substring(w, 1, 1)
    tail = F.regexp_replace(F.substring(w, 2, 1 << 20), "[hw]", "")
    d = F.translate(F.concat(first, tail), "abcdefghijklmnopqrstuvwxyz",
                    _SOUNDEX_TO)
    for c in "0123456":
        d = F.regexp_replace(d, c + "{2,}", c)
    d = F.regexp_replace(d, "0", "")
    fc = F.translate(first, "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_TO)
    digits = F.when(fc == "0", d).otherwise(F.substring(d, 2, 1 << 20))
    return F.when(w == "", F.lit(None).cast("string")).otherwise(
        F.concat(F.upper(first), F.substring(F.concat(digits, F.lit("000")),
                                             1, 3)))


def phonetic_blocks(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Phonetic ER blocking over the corpus VOCABULARY: every distinct
    word (lowered, letters only) keyed by its ``phonetic_key``, with the
    size of its block — the sound-alike candidate structure (words in
    one block are spelling-variant candidates without any pair join).
    The corpus reduces to distinct words FIRST (vocab ≪ tokens — the
    BPE discipline), the code is a pure projection, and the block size
    is one code-keyed count joined back.  Returns (word, code,
    block_n:long)."""
    # distinct the RAW tokens first so the regex strip runs over the raw
    # vocabulary, not the token stream (|vocab| ≪ |tokens| — measured
    # ~0.6× the entry wall at sf0.1); stripped forms re-distinct
    words = (documents
             .select(F.explode(tokens_col(F.lower(F.col(text_col))))
                     .alias("raw"))
             .distinct()
             .select(F.regexp_replace("raw", "[^a-z]", "").alias("word"))
             .where(F.col("word") != "").distinct())
    from pyspark.sql import Window
    coded = words.select("word", phonetic_key(F.col("word")).alias("code"))
    # block size via a code-keyed window over the coded vocab — the former
    # groupBy + join-back re-derived the whole distinct-vocab + Soundex
    # pipeline on the aggregate side (no exchange reuse: the partial
    # aggregate sits below the agg-side exchange), i.e. two corpus token
    # distincts and two regex passes per run.  One window = one pipeline
    # pass; the partition key is the Soundex code (≤ 26·10³ classes over
    # the vocab, never corpus rows), so no partition outgrows vocab scale.
    w = Window.partitionBy("code")
    return coded.select("word", "code",
                        F.count(F.lit(1)).over(w).cast("long")
                        .alias("block_n"))
