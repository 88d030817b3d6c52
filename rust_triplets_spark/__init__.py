"""rust_triplets_spark — a PySpark-native data-pipeline engine with the query
and data-processing capabilities of the ``jzombie/rust-triplets`` reference
(deterministic text-corpus ingestion, denoising, chunking, split assignment,
epoch shuffling, and triplet/pair/text sampling), re-expressed as Spark
DataFrame/SQL transformations, plus the large-scale training-data operators
(dedup, similarity search, multimodal columns, text analysis) the reference
does not have.

Design stances (see SURVEY.md §7.0):

- **Determinism via stateless seeded hashing, not RNG streams.** Every cursor
  or RNG in the reference (``src/sampler/mod.rs:56-104``,
  ``src/splits.rs:102-117``) is replaced by a pure function of
  ``(seed, epoch, step, id)`` built on one explicit 31-bit arithmetic hash
  (:mod:`rust_triplets_spark.functions.hashing`) that evaluates identically in
  Spark SQL and DuckDB SQL — so shuffles/splits/swaps are oracle-checkable.
- **DataFrame-first.** Operators are declarative column expressions / joins;
  Catalyst gets to push down, prune, and pick join strategies. Pandas UDFs
  only where semantics are genuinely iterative (denoiser gate 3).
- **Scale-first.** Sampling picks are O(n) indexed-pool joins (never
  per-anchor candidate explosion), aggregations are partial-agg friendly, and
  small sides are broadcast.
"""

__version__ = "0.1.0"

from rust_triplets_spark.session import get_spark  # noqa: F401
