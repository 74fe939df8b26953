"""Multi-host (multi-process) mesh tier: a REAL 2-process jax
.distributed run over Gloo — the CPU stand-in for a pod's DCN axis
(SURVEY.md §2.5: the reference has no communication backend at all).

The single-process tests in test_parallel.py cover sharding semantics
on the virtual 8-device backend; this one covers the multi-controller
path itself: global mesh assembly, make_array_from_process_local_data
placement, and cross-process loss/grad reductions matching the
single-controller oracle.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_loss_and_grads_match_oracle():
    port = _free_port()
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen([sys.executable, WORKER, str(port), str(i)],
                              cwd=REPO, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "DIST OK" in out, f"proc {i} output:\n{out}"
