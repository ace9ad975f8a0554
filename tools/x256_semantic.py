"""One-off x256 confirmation probe for semantic_dedup_keep_best.

The r11 verdict flagged its x128 tail exponent (1.013) as the same
auto-LSH O(N·logN) log factor embedding_near_dup showed (1.22 at x128,
0.67 at the 128→256 tail) and asked for the same x256 confirmation.
Reuses the committed scratch tiers and the run_probe shuffle counters;
merges into SCALE_TREND_X256.json exactly like main() would.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import REPO, run_probe  # noqa: E402
from stream_loader_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "scale_probe",
    extra_conf={
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.files.maxPartitionBytes": str(4 << 20),
        "spark.sql.files.openCostInBytes": str(1 << 20),
        "spark.ui.enabled": "true",
    },
)
out = run_probe(
    spark,
    "/root/testdata/sf0.1",
    [128, 256],
    ["semantic_dedup_keep_best"],
    os.path.join(REPO, "spark-warehouse", "scale_probe"),
    passes=2,
)
path = os.path.join(REPO, "SCALE_TREND_X256.json")
prev = json.load(open(path))
if prev.get("sf") == out["sf"] and prev.get("mults") == out["mults"]:
    merged = dict(prev.get("queries", {}))
    merged.update(out["queries"])
    out["queries"] = merged
json.dump(out, open(path, "w"), indent=1)
print(json.dumps(out["queries"]["semantic_dedup_keep_best"]))
