"""Deduplication operators for large-scale document corpora.

Four families, all shuffle-disciplined for the 100 TB design point:

- exact       — hash-groupBy on a content digest; one shuffle on a 32-byte
                key regardless of document size.
- minhash LSH — shingle → per-seed min-hash signature → banded bucket join;
                candidate generation never compares all pairs, only
                same-bucket ones. Signatures/bands are md5-based and
                portable to DuckDB for oracle checking.
- simhash     — 32-bit sign-aggregated token-hash fingerprint computed as
                32 independent aggregate expressions (no per-bit explode).
- n-gram Jaccard — exact pairwise similarity on a *candidate subset*
                (LSH output or an explicit filter); the only quadratic
                piece, deliberately bounded.

No Python UDFs anywhere — everything is hash/explode/groupBy, which keeps
the hot path in whole-stage codegen and lets AQE coalesce the bucket join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions.text import tokens


def normalized_text(text: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical (normalized) texts; keep the minimum id as canonical.

    Returns (content_hash, keep_id, n_copies, dup_ids_csv).
    """
    hashed = df.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("content_hash")
    )
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(id_col)), lambda x: x.cast("string")
            ),
            ",",
        ).alias("dup_ids_csv"),
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the tokenized text (empty-safe)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, seed, minhash) — the minhash signature, exploded by seed.

    The per-seed hash is ``md5(seed || ':' || shingle)`` and the signature
    element is its lexicographic minimum — a valid minhash family over the
    md5 hex string ordering, and byte-identical in DuckDB.
    """
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
    )
    seeded = shingled.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "shingle",
    )
    return seeded.groupBy(id_col, "seed").agg(
        F.min(
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle")))
        ).alias("minhash")
    )


def minhash_band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, band, band_key): md5 over the band's signature slice in seed
    order. Documents sharing any (band, band_key) are near-dup candidates.
    """
    rows_per_band = num_hashes // bands
    banded = signatures.withColumn(
        "band", F.floor(F.col("seed") / rows_per_band).cast("long")
    )
    return banded.groupBy(id_col, "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"],
                ),
                ",",
            )
        ).alias("band_key")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct candidate near-duplicate pairs (id_a < id_b) via LSH.

    Scale shape: the self-join is on (band, band_key) — an equi-join on a
    high-cardinality key, shuffle-partitioned, never all-pairs. AQE's skew
    handling covers pathological buckets (e.g. many empty documents).
    """
    bands_df = minhash_band_keys(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_n),
        id_col,
        bands,
        num_hashes,
    )
    a = bands_df.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    )
    b = bands_df.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over shingle sets for all pairs in ``df``.

    Quadratic by nature — callers bound the input (LSH candidates or an
    explicit subset). Implemented as shingle-postings self-join (documents
    sharing no shingle never meet), not a cross join.
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b")
    )
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold else out


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) — sign-aggregated 32-bit token-hash fingerprint.

    Per token: h = first 8 md5 hex digits as a 32-bit int. Per bit j the
    corpus-side vote is sum(2*bit_j(h)-1) over tokens; simhash sets bit j
    iff the vote is positive. Computed as ``bits`` independent aggregate
    expressions — one shuffle, no per-bit row explosion.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    tok = tok.select(id_col, h.alias("h"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.alias("simhash"))
