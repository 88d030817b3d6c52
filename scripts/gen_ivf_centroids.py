"""Generate the persisted IVF coarse-quantizer fixture.

Trains the SAME MLlib k-means as the deploy ANN path
(``operators/similarity.ann_ivf_topk``: seed ``IVF_SEED``, auto-sized
cells, maxIter=10) on the sf0.01 ``embeddings`` table, quantizes the
centroids to the cross-engine integer grid (``round(c * 2^20)``), and
writes them to ``fixtures/ivf_centroids.json``.

The fixture is what makes the float-IVF pipeline's cell-assignment /
probe / candidate-count stages oracle-checkable (the
``ann_ivf_float_cells`` driver query): training is iterative and not
SQL-expressible, but once the centroids are PERSISTED CONSTANTS the rest
of the pipeline is exact integer arithmetic both engines agree on. This
mirrors the real deployment shape — train the quantizer once on a
sample, apply it corpus-wide as fixed constants.

Usage: python scripts/gen_ivf_centroids.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from rust_triplets_spark.operators.similarity import (
        IVF_SEED,
        QUANT,
        auto_cells,
    )
    from rust_triplets_spark.session import get_spark

    spark = get_spark("gen_ivf_centroids", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    train = df.select(
        F.col("vec_id").cast("long").alias("id"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    rows = train.count()
    k = auto_cells(rows)
    model = KMeans(k=k, seed=IVF_SEED, maxIter=10).fit(train)
    centroids = [
        [int(round(float(x) * QUANT)) for x in c] for c in model.clusterCenters()
    ]
    out = {
        "trained_on": sf_dir,
        "rows": rows,
        "seed": IVF_SEED,
        "max_iter": 10,
        "quant": QUANT,
        "n_centroids": k,
        "dim": len(centroids[0]),
        "centroids": centroids,
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "ivf_centroids.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh)
        fh.write("\n")
    print(f"wrote {dest}: k={k} dim={out['dim']} rows={rows}")


if __name__ == "__main__":
    main()
