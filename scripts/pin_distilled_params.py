"""Pin the distilled CRF student parameters at sf0.01 (VERDICT r9 #2).

The distillation training pipeline is fully deterministic (explicit
8-shard assignment, sorted per-shard order, fixed collect order,
Collins averaging over a deterministic trajectory), so the quantized
student params are a reproducible constant of (data, config).  This
script recomputes them on the driver's sf0.01 testdata and snapshots
them to edsnlp_spark/resources/distilled_crf.json, which the oracle
SQL builders in edsnlp_spark/queries/advanced.py replay through the
recursive-CTE Viterbi.  Rerun whenever the training config, the
teacher params, or the testdata change:

    python scripts/pin_distilled_params.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import edsnlp_spark as es
    from edsnlp_spark.queries.advanced import _train_quantized_student

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = es.get_spark(app_name="pin-distilled-params")
    _, full = _train_quantized_student(spark, sf_dir)
    _, split = _train_quantized_student(spark, sf_dir, heldout_mod=(5, 4))
    out = {
        "comment": "integer-quantized distilled CRF params pinned at "
                   "sf0.01 (scripts/pin_distilled_params.py); 'full' = "
                   "trained on the whole corpus (a0_crf_distillation), "
                   "'split' = trained on note_id % 5 != 4 "
                   "(a0_distillation_eval)",
        "sf_dir": sf_dir,
        "config": {"n_epochs": 3, "n_shards": 8, "average": True,
                   "feature_scale": "1/255", "scale_bits": 16},
        "full": dict(zip(("W", "b", "s0", "T"), full)),
        "split": dict(zip(("W", "b", "s0", "T"), split)),
    }
    path = os.path.join(_REPO, "edsnlp_spark", "resources",
                        "distilled_crf.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    print("full:", json.dumps(out["full"]))
    print("split:", json.dumps(out["split"]))
    spark.stop()


if __name__ == "__main__":
    main()
