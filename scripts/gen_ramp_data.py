"""Generate synthetic scale-up replicas of sf0.1 for the scale-ramp study
(SCALING.md): x3/x10/x100/x300 directories under .ramp_data/ (gitignored).

The naive approach — replicate rows verbatim with new ids — would corrupt
the measurement: every document would gain k exact/near duplicates, so
candidate-pair counts (and thus dedup runtime) would grow quadratically
in the replication factor, not because the ALGORITHM is super-linear but
because the DATA's duplicate density was inflated. Instead each replica
keeps per-row work and duplicate density roughly constant:

- documents: replica k deterministically word-shuffles each text (sort
  words by md5(word:pos:k)) AND substitutes every 7th token with a
  replica-salted md5 word. The shuffle kills cross-replica 3-shingle
  overlap (MinHash/Jaccard near-dup pairs); the substitution is required
  for ORDER-INDEPENDENT fingerprints — simhash is a bag-of-tokens sign
  vote, so a pure reorder leaves its fingerprint bit-identical and every
  replica group would collide into one Hamming-0 clique (observed: x100
  simhash runtime exploded quadratically before the substitution).
  Identical texts inside a replica still transform identically, so the
  original intra-replica exact-dup structure is preserved. doc_id offset
  by k*10^7.
- embeddings: replica k rotates each vector k*7+1 positions (norm and
  component distribution preserved, cross-replica cosine decorrelated);
  vec_id offset likewise, label kept.
- events: ids offset, everything else verbatim (event queries are
  per-row scans/aggs; duplicate structure is irrelevant to their cost).

Replica 0 is the original data, so x3 and x10 are proper supersets.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark import get_spark
from kafka_stream_unify_order_messages_spark.sources.files import load_table

SRC = "/root/testdata/sf0.1"
OUT_ROOT = Path(__file__).resolve().parent.parent / ".ramp_data"
ID_OFFSET = 10_000_000


def shuffled_docs(docs, k: int):
    if k == 0:
        return docs
    ws = F.split(F.trim(F.col("text")), r"\s+")
    keyed = F.transform(
        ws,
        lambda w, i: F.struct(
            F.md5(
                F.concat_ws(":", w, i.cast("string"), F.lit(str(k)))
            ).alias("h"),
            w.alias("w"),
        ),
    )
    shuffled = F.transform(F.array_sort(keyed), lambda s: s["w"])
    mutated = F.transform(
        shuffled,
        lambda w, i: F.when(
            (i + F.lit(k)) % 7 == 0,
            F.substring(
                F.md5(
                    F.concat_ws(":", w, i.cast("string"), F.lit(str(k)))
                ),
                1,
                8,
            ),
        ).otherwise(w),
    )
    text_k = F.array_join(mutated, " ")
    return docs.select(
        (F.col("doc_id") + k * ID_OFFSET).alias("doc_id"),
        text_k.alias("text"),
        "lang",
        "source",
        F.length(text_k).alias("n_chars"),
    )


def rotated_embeddings(emb, k: int):
    if k == 0:
        return emb
    shift = (k * 7 + 1) % 64
    rolled = F.concat(
        F.slice("embedding", shift + 1, 64 - shift),
        F.slice("embedding", 1, shift),
    )
    return emb.select(
        (F.col("vec_id") + k * ID_OFFSET).alias("vec_id"),
        rolled.alias("embedding"),
        "label",
    )


def offset_events(ev, k: int):
    if k == 0:
        return ev
    return ev.select(
        (F.col("event_id") + k * ID_OFFSET).alias("event_id"),
        "ts",
        (F.col("user_id") + k * ID_OFFSET).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def build(spark, factor: int, out_dir: Path) -> None:
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)
    docs = load_table(spark, SRC, "documents")
    emb = load_table(spark, SRC, "embeddings")
    ev = load_table(spark, SRC, "events")
    unions = {
        "documents": [shuffled_docs(docs, k) for k in range(factor)],
        "embeddings": [rotated_embeddings(emb, k) for k in range(factor)],
        "events": [offset_events(ev, k) for k in range(factor)],
    }
    for name, parts in unions.items():
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # single parquet FILE per table, matching the testdata layout
        # load_table expects ({dir}/{table}.parquet readable as one path)
        tmp = out_dir / f"_{name}_tmp"
        df.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(
            str(tmp)
        )
        dest = out_dir / f"{name}.parquet"
        dest.mkdir()
        for i, f in enumerate(sorted(tmp.glob("*.parquet"))):
            shutil.move(str(f), dest / f"part-{i:03d}.parquet")
        shutil.rmtree(tmp)
        n = spark.read.parquet(str(dest)).count()
        print(f"{out_dir.name}/{name}: {n} rows", file=sys.stderr)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [3, 10, 100, 300]
    spark = get_spark("gen-ramp-data", master="local[32]")
    for f in factors:
        build(spark, f, OUT_ROOT / f"x{f}")
    spark.stop()


if __name__ == "__main__":
    main()
