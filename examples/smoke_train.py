"""Tiny end-to-end training smoke: synthetic scenes, few steps, prints losses.

    python examples/smoke_train.py
"""

import subprocess
import sys

subprocess.run(
    [sys.executable, "train.py", "--dataset", "synthetic", "--experiment_name",
     "smoke", "--max_steps", "3", "--batch_size", "1", "--image_size", "64",
     "--query_sparsity", "32", "--pose", "--logging_root", "/tmp/coponerf_logs"],
    check=True,
)
print(open("/tmp/coponerf_logs/smoke/summaries/metrics.jsonl").readlines()[-1])
