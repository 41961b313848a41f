"""Record the trained-vs-seeded PQ codebook recall lift on the
adversarial tier (VERDICT r7 #7): sf0.1 embeddings (isotropic random —
the hardest case for any quantizer), recall@3 vs the exact top-3, for
seeded sub-codebooks (the hash-oracle anchor) and spherical-k-means
trained ones (`train_subcodebooks`, the production recall path), across
refine depths.

Usage: python tools/bench_pq_recall.py [sf_dir]
Prints one JSON line {"refine": {"seeded": r, "trained": r}, ...}.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asctb_ct_label_mapper_spark.operators.similarity import (  # noqa: E402
    pq_topk,
    top_k_similarity_blocked,
    train_subcodebooks,
)
from asctb_ct_label_mapper_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-pq-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    reference = emb.filter(F.col("vec_id") % 10 != 0).select("vec_id", "embedding")
    exact = {
        (r["vec_id"], r["ref_id"])
        for r in top_k_similarity_blocked(
            queries, reference, 3, ["vec_id"], "vec_id"
        ).collect()
    }
    trained_cb = train_subcodebooks(reference)
    out: dict = {}
    for refine in (4, 16, 32):
        row: dict = {}
        for label, cb in (("seeded", None), ("trained", trained_cb)):
            got = {
                (r["vec_id"], r["ref_id"])
                for r in pq_topk(
                    queries, reference, 3, ["vec_id"], "vec_id",
                    refine=refine, codebooks=cb,
                ).collect()
            }
            row[label] = round(len(got & exact) / len(exact), 4)
        out[str(refine)] = row
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
