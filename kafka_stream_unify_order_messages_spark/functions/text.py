"""Text-analysis Column expressions for training-data pipelines.

All JVM-side built-ins (split / regexp / md5 / aggregate) — no Python UDFs
anywhere, so these run inside whole-stage codegen over arbitrarily large
document scans. Hashes use an md5-hex convention that DuckDB reproduces
exactly (``CAST('0x'||substr(md5(x),1,N) AS BIGINT)``), so every operator
built on them is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# A BPE-ish pretokenizer: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language stopword sets for the n-gram/stopword lang-id heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.trim(F.lower(_c(text))), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pretokens (letters / digits / single symbols)."""
    return F.regexp_count(_c(text), F.lit(BPE_TOKEN_PATTERN)).cast("long")


def char_count(text: Column | str) -> Column:
    return F.length(_c(text)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0.0 for empty text)."""
    t = _c(text)
    n = F.length(t)
    punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    return F.when(n > 0, F.round(punct / n, 6)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n = F.size(toks)
    return F.when(n > 0, F.round(n_stop / n, 6)).otherwise(F.lit(0.0))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, F.round(total / F.size(toks), 6)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards moderate length,
    penalizes punctuation soup and one-char tokens. Deterministic and
    SQL-portable; tune weights per corpus.
    """
    t = _c(text)
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(t) * 4, F.lit(1.0))
    short_tok = F.size(F.filter(tokens(t), lambda x: F.length(x) <= 1))
    short_penalty = F.least(
        short_tok / F.greatest(token_count(t), F.lit(1)), F.lit(1.0)
    )
    return F.round(
        len_score * (1 - 0.5 * punct_penalty) * (1 - 0.5 * short_penalty), 6
    )


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS; 'und' when no vote.

    Ties break by language code order (deterministic). Heuristic by design —
    the real discriminator at scale is the same shape with bigger tables.
    """
    toks = tokens(text)
    scored = []
    for i, (lang, words) in enumerate(sorted(LANG_STOPWORDS.items())):
        arr = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # negative index makes struct-max prefer the *earliest* code on ties
        scored.append(
            F.struct(
                score.alias("score"),
                F.lit(-i).alias("nr"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_trigram_profiles() -> dict[str, list[str]]:
    """Deterministic per-language char-trigram profiles derived from the
    stopword lists (each word padded with spaces, all trigrams taken) —
    embedded as literals on both engines, so fully oracle-checkable.
    """
    profiles = {}
    for lang, words in sorted(LANG_STOPWORDS.items()):
        grams: list[str] = []
        for w in words:
            padded = f" {w} "
            for i in range(len(padded) - 2):
                g = padded[i : i + 3]
                if g not in grams:
                    grams.append(g)
        profiles[lang] = grams
    return profiles


def char_trigrams(text: Column | str) -> Column:
    """All char trigrams of the space-padded lowercased text (with
    multiplicity — occurrence counts matter for the language vote).

    The padded string is let-bound through a one-element-array transform:
    interpreted HOF lambdas re-evaluate free expressions per element, so
    referencing the concat/lower/trim chain directly inside the inner
    lambda would recompute it per gram — O(len^2) per document."""
    raw = F.concat(F.lit(" "), F.lower(F.trim(_c(text))), F.lit(" "))
    return F.element_at(
        F.transform(
            F.array(raw),
            lambda t: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.length(t) - 2, F.lit(0))
                ),
                lambda i: F.substring(t, i, F.lit(3)),
            ),
        ),
        1,
    )


def lang_id_ngram(text: Column | str) -> Column:
    """Character-n-gram language ID: vote = number of the document's char
    trigrams found in each language's trigram profile; best vote wins,
    'und' when nothing matches. More robust than the stopword vote for
    text without clean token boundaries; same scan-local, no-UDF shape.

    The trigram array is bound through a one-element-array transform
    (expression let-binding) so it is built once per row, not once per
    language.
    """
    profiles = lang_trigram_profiles()
    grams_expr = char_trigrams(text)

    def score_langs(grams):
        scored = []
        for i, (lang, prof) in enumerate(profiles.items()):
            arr = F.array(*[F.lit(g) for g in prof])
            score = F.size(
                F.filter(grams, lambda g: F.array_contains(arr, g))
            )
            scored.append(
                F.struct(
                    score.alias("score"),
                    F.lit(-i).alias("nr"),
                    F.lit(lang).alias("lang"),
                )
            )
        best = F.array_max(F.array(*scored))
        return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))

    return F.element_at(
        F.transform(F.array(grams_expr), score_langs), 1
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 over the sorted distinct token bag.

    Invariant to token order and duplication — a cheap canonical-content
    hash for near-identical permuted documents.
    """
    bag = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(bag)


def hex_hash64(col: Column | str, bits_hex: int = 15) -> Column:
    """Deterministic 60-bit integer hash, portable to DuckDB:
    Spark  : conv(substr(md5(x),1,15),16,10)::long
    DuckDB : CAST('0x'||substr(md5(x),1,15) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, bits_hex), 16, 10).cast("long")


def hex_hash32(col: Column | str) -> Column:
    """32-bit variant (first 8 md5 hex digits)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


# PII scrubbing patterns: deliberately simple, deterministic, and shared
# verbatim with the DuckDB oracle. Real pipelines extend the pattern set;
# the operator shape (chained regexp_replace + regexp_count, all codegen)
# is what matters at scale.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b555-[0-9]{4}\b"


def pii_counts(text: Column | str) -> Column:
    """(n_emails, n_phones) struct — counts BEFORE scrubbing."""
    t = _c(text)
    return F.struct(
        F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
    )


def scrub_pii(text: Column | str) -> Column:
    """Mask emails/phones with typed placeholder tokens. Pure
    regexp_replace (global), so the scrub stays inside codegen on a
    full-corpus scan."""
    t = _c(text)
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )


def bigram_repetition(text: Column | str) -> Column:
    """Gopher-style repetition signal: fraction of word-bigram instances
    that are repeats of an earlier bigram in the same document
    (1 - distinct/total; 0.0 for docs with < 2 tokens).

    Scan-local. The token array is let-bound through a lambda variable so
    the regexp split runs once per document, not once per bigram
    (interpreted higher-order functions do no CSE — see
    operators/dedup.py:shingles_from_tokens).
    """

    def rep(tk: Column) -> Column:
        n_bi = F.size(tk) - 1
        bigrams = F.transform(
            F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.element_at(tk, i), F.element_at(tk, i + 1)
            ),
        )
        return F.when(
            n_bi > 0,
            F.round(
                1.0 - F.size(F.array_distinct(bigrams)) / n_bi.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(tokens(text)), rep), 1)


# ---------------------------------------------------------------------------
# Hashing-trick linear quality classifier (fastText-style scorer shape).
# Real pipelines load trained weights; the MECHANISM — token -> hashed
# feature bucket -> weight lookup -> mean logit -> sigmoid — is identical,
# and deterministic md5-derived weights keep it oracle-checkable. Fully
# scan-local: zero shuffles, zero UDFs, one codegen pass over the corpus.
# ---------------------------------------------------------------------------

QC_BUCKETS = 1024
QC_SCALE = 4.0


def _qc_bucket_weight(bucket: Column) -> Column:
    """Deterministic weight in [-1, 1] for a feature bucket: the md5 of
    'qcw|<bucket>' mapped through mod 2001. Portable to DuckDB verbatim."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("qcw|"), bucket.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % 2001 - 1000) / F.lit(1000.0)


def quality_classifier_score(text: Column | str) -> Column:
    """Sigmoid(mean hashed-token weight * scale) in (0, 1); 0.5 exactly
    for empty documents (zero logit). Token -> bucket uses the shared
    hex_hash64 convention so the oracle reproduces every bit before the
    final 6-decimal rounding."""

    def score(tk: Column) -> Column:
        weights = F.transform(
            tk,
            lambda t: _qc_bucket_weight(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("qc|"), t)), 1, 15), 16, 10
                ).cast("long")
                % QC_BUCKETS
            ),
        )
        logit = F.when(
            F.size(tk) > 0,
            F.aggregate(weights, F.lit(0.0), lambda acc, w: acc + w)
            / F.size(tk).cast("double")
            * F.lit(QC_SCALE),
        ).otherwise(F.lit(0.0))
        return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)

    scored = F.element_at(F.transform(F.array(tokens(text)), score), 1)
    # blank text whitespace-splits to [''] (house tokenizer convention),
    # which would score the empty-string token; gate it to a 0.5 prior
    return F.when(F.length(F.trim(_c(text))) > 0, scored).otherwise(F.lit(0.5))


def normalize_text(text: Column | str) -> Column:
    """Unicode/whitespace cleanup — the first stage of every real corpus
    pipeline (CCNet's normalization, Dolma's `uniseg` pass, HF
    `text-normalization`): strip C0/C1 control characters, fold curly
    quotes and en/em dashes to their ASCII forms, collapse every
    whitespace run to one space, trim. Deterministic, scan-local, and
    SQL-portable (regexp_replace + translate exist identically in
    DuckDB), so the op is value-checkable end-to-end.

    Deliberately NOT full NFC/NFKC (no ICU in either engine); the
    structure — ordered rule chain, each rule a codegen'd expression — is
    what a production build extends with a proper normalizer UDF.
    """
    t = _c(text)
    t = F.regexp_replace(
        t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    t = F.translate(t, "’‘“”–—", "''\"\"--")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)
