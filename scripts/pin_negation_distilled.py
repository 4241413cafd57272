"""Pin the distilled negation-qualifier student params (r11).

Training is fully deterministic (explicit shards + sorted per-shard
order + fixed collect order), so the quantized params are a constant
of (sf0.01 data, config).  This script trains the FULL-corpus student
and the doc_id%5!=4 SPLIT student twice each, asserts bit-identical
params across runs, and snapshots them to
edsnlp_spark/resources/negation_distilled.json — the oracle replays
the decode with these ints, so a driver hash mismatch catches ANY
training-pipeline drift (the distilled_crf / langid pattern).

Usage: python scripts/pin_negation_distilled.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import edsnlp_spark as es  # noqa: E402

SF = "/root/testdata/sf0.01"


def main():
    spark = es.get_spark(master="local[8]")
    from edsnlp_spark.queries.advanced import _train_negation_student

    out = {}
    for name, heldout in (("full", None), ("split", (5, 4))):
        runs = []
        for _ in range(2):
            inst, (Wq, bq) = _train_negation_student(spark, SF,
                                                     heldout_mod=heldout)
            runs.append({"W": Wq, "b": bq})
        assert runs[0] == runs[1], f"{name}: training not deterministic"
        out[name] = runs[0]
        print(f"{name}: det-verified, |W0|={sum(map(abs, runs[0]['W'][0]))}")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "edsnlp_spark", "resources",
        "negation_distilled.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
