"""Print the bench's two box-speed calibration figures and exit.

The container's load average cannot see cross-tenant contention (measured:
cal agg 1.256 at load 0.11), so this is the only trustworthy quiet-box
gauge before committing to a full bench run.

    python examples/probe_cal.py          # {"agg": ..., "alloc": ...}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark

import bench


def main() -> None:
    spark = get_spark(app_name="vlds-cal")
    cal = bench._calibration(spark, reps=3)
    print(json.dumps({k: min(v) for k, v in cal.items()}))


if __name__ == "__main__":
    main()
