"""One-off throughput probe: ScanNet MASKED-encoder config (3DETR-m — the
reference's best model; scripts/scannet_masked_ep1080.sh, BASELINE config
"ScanNet masked+color open-set long run").

Reuses bench.py's machinery (same loader/group-step/window protocol, same
persistent compile cache) on scannet_quick shapes with the masked encoder
(radius-masked attention consumed in-kernel by the Pallas attention,
models/transformer.py) and the run script's matcher/loss weights.  Prints
ONE JSON line; the dated result is recorded in docs/PROFILE.md.  Run
standalone, one compute job at a time (.claude/skills/verify)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the persistent compile cache on import)
from ov3det.config import (  # noqa: E402
    EncoderConfig,
    LossConfig,
    MatcherConfig,
    replace,
    scannet_quick,
)


def main():
    budget = bench.Budget(float(os.environ.get("BENCH_BUDGET_S", 2700)))
    base = scannet_quick()
    cfg = replace(
        base,
        model=replace(
            base.model,
            encoder=EncoderConfig(kind="masked", dropout=0.3),
        ),
        # reference scripts/scannet_masked_ep1080.sh weights
        loss=LossConfig(
            matcher=MatcherConfig(cost_class=1.0, cost_objectness=0.0,
                                  cost_center=0.0, cost_giou=2.0),
            giou_weight=1.0,
            no_object_weight=0.25,
        ),
    )
    result = {"metric": "train_scenes_per_sec_per_chip_scannet_masked_e2e",
              "unit": "scenes/sec/chip"}
    e2e, *ctx = bench.bench_point_e2e(
        cfg, budget, result, num_points=bench.SCANNET_NUM_POINTS,
        kp="scannet_masked", label="scannet-masked",
    )
    result["value"] = round(e2e, 3)
    result["vs_baseline"] = round(e2e / bench.REFERENCE_SCENES_PER_SEC, 3)
    bench.bench_point_step_only(
        cfg, *ctx, budget, result, num_points=bench.SCANNET_NUM_POINTS,
        kp="scannet_masked_", with_mfu=False,
    )
    if "scannet_masked_step_only_scenes_per_sec" in result:
        result["scannet_masked_step_only_vs_baseline"] = round(
            result["scannet_masked_step_only_scenes_per_sec"]
            / bench.REFERENCE_SCENES_PER_SEC, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
