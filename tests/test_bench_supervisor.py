"""bench.py attach-supervision contract.

The driver consumes bench.py's LAST stdout JSON line and its exit
code; a wedged TPU attach used to hang the process past the driver's
timeout (rc 124, nothing parseable).  These tests pin the supervisor
guarantees without any device: a run whose attach never lands within
BENCH_ATTACH_BUDGET_S must still exit 0 with a parseable, explicitly
marked record as the last line, and the very first line (provisional)
must already parse so even an external kill mid-run leaves a record.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra, timeout=120):
    env = {k: v for k, v in os.environ.items()}
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH, "--smoke", "--no-tf"],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO)


def test_wedged_attach_still_emits_parseable_record():
    # Attach budget too short for the child to even finish importing
    # jax — simulates the indefinitely-blocked libtpu attach.  The
    # output must parse whether consumers take the first or last line.
    proc = _run_bench({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                       "BENCH_ATTACH_BUDGET_S": "1"})
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert lines, "no stdout at all"
    for line in (lines[0], lines[-1]):
        rec = json.loads(line)
        assert rec["metric"] == "burgers_train_steps_per_sec"
        assert rec["value"] > 0
        assert "fallback" in rec
        assert rec["vs_baseline"] > 0
        assert rec["unit"] == "steps/s"
