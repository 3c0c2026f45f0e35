"""Executor-loss resilience: task retries must not be able to flip an
oracle hash (VERDICT r07 #6). The scenario body lives in
``retry_scenarios.py`` and runs in a subprocess because
``spark.task.maxFailures`` is only settable at context creation
(``local[8,2]`` master), which the shared session fixture can't do."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_injected_task_retries_cannot_flip_hashes():
    script = os.path.join(os.path.dirname(__file__), "retry_scenarios.py")
    proc = subprocess.run(
        [sys.executable, script, "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    payload = json.loads(line)
    assert proc.returncode == 0, (payload, proc.stderr[-2000:])
    assert payload["ok"], payload
    # every scenario actually ran and matched
    assert sorted(payload["scenarios"]) == [
        "bpe_counts",
        "minhash_index",
        "sequence_packing",
        "stratified_sample",
        "weighted_sample",
    ]
    assert all(s["match"] for s in payload["scenarios"].values()), payload
