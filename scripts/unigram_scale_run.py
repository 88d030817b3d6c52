"""Tokenizer-real unigram training run (r11; r10 verdict next-round #3).

The driver-generated sf1 ``documents`` table has a 31-word vocabulary
(by construction — its substring universe tops out at ~254 pieces), so a
>=4k-piece vocabulary is structurally impossible on it. This harness
therefore runs the pruned trainer twice and SCALE.md records both:

1. the actual sf1 documents table at its natural vocabulary ceiling
   (what the corpus supports, wall-clock for the corpus-scale jobs), and
2. a deterministic rich corpus at the same row scale (1M docs, ~50k
   distinct words synthesized from base-26 codes with a Zipf-ish rank
   mix) where seed 12288 -> prune 20%/round -> 4096 pieces exercises the
   Kudo §4 loop at tokenizer-real size.

Usage: python scripts/unigram_scale_run.py [sf1_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rust_triplets_spark.operators.unigram import train_unigram  # noqa: E402
from rust_triplets_spark.session import get_spark  # noqa: E402


def rich_corpus(spark, n_docs: int = 1_000_000, words_per_doc: int = 30):
    """Deterministic high-cardinality corpus: every token is a base-26
    code of a Zipf-ish rank (rank = id^2 mod V keeps low ranks frequent),
    so the distinct-word table is ~50k rows and the substring universe
    comfortably exceeds the 12k seed."""
    v = 50_000
    return spark.range(n_docs).select(
        F.expr(
            f"""
            array_join(transform(sequence(1, {words_per_doc}), k ->
              concat('w', conv(
                CAST(pmod(id * 2654435761 + k * k * 97, {v}) AS STRING),
                10, 26))), ' ')
            """
        ).alias("text")
    )


def run(tag: str, df, **kw) -> None:
    t0 = time.time()
    rows, words = train_unigram(df, "text", **kw)
    n_words = words.count()
    dt = time.time() - t0
    multi = sum(1 for r in rows if r[1] > 1)
    alpha = len(rows) - multi
    print(
        f"{tag}: {dt:.1f}s  vocab={len(rows)} (alpha={alpha} "
        f"multi={multi})  distinct_words={n_words}  knobs={kw}"
    )


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    spark = get_spark("unigram-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.rust_triplets.scanPartitions", "32")

    docs = spark.read.parquet(os.path.join(sf1, "documents.parquet"))
    run(
        "sf1-documents (natural ceiling)", docs,
        seed_multi=12288, vocab_multi=4096, em_rounds=5, prune_frac=0.2,
    )

    rich = rich_corpus(spark)
    run(
        "rich-1M-docs (4k pieces)", rich,
        max_word_len=8, max_piece_len=5,
        seed_multi=12288, vocab_multi=4096, em_rounds=5, prune_frac=0.2,
    )


if __name__ == "__main__":
    main()
