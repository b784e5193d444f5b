"""Multi-PROCESS distributed execution (VERDICT r3 next-step #5).

`dryrun_multichip` and the virtual 8-device mesh exercise multi-DEVICE
sharding inside one process; this suite runs the path they structurally
cannot: `jax.distributed.initialize` across ≥2 OS processes (coordinator
+ worker), a global mesh whose shards live in different address spaces,
and the production sharded solve step whose psum-reduced stats cross the
process boundary (gloo CPU collectives — the CI stand-in for ICI/DCN,
SURVEY.md §4 multi-node clause).

Each worker is a real subprocess (tests/_distributed_worker.py); the
parent asserts both exit cleanly, saw the 8-device global mesh, agree on
the psum-reduced fleet stats, and that the distributed solution matches
the single-process oracle (golden lane 0 ≤ 2e-4, reference tolerance
`/root/reference/test/TestTimeInvariantSystems.cpp:1158-1169`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from fixtures import GOLDEN_CONTROL

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
NPROC = 2
TIMEOUT_S = 600


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_outputs():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, HERE] + env.get("PYTHONPATH", "").split(os.pathsep))
    # the workers pin their own backend via jax.config; scrub the parent
    # test-session env so they start from a clean slate
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u",
             os.path.join(HERE, "_distributed_worker.py"),
             str(pid), str(NPROC), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env)
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=TIMEOUT_S)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
    parsed = []
    for rc, out, err in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        parsed.append(json.loads(line))
    return sorted(parsed, key=lambda d: d["process_id"])


def test_two_processes_form_one_global_mesh(worker_outputs):
    assert [d["process_id"] for d in worker_outputs] == [0, 1]
    for d in worker_outputs:
        assert d["n_processes"] == NPROC
        assert d["n_global_devices"] == 8


def test_cross_process_psum_stats_agree(worker_outputs):
    """The shard_map stats are psum/pmax over a mesh axis that spans the
    process boundary — both processes must see the same global totals."""
    for d in worker_outputs:
        assert d["total"] == 16
        assert d["converged"] == 16
    assert worker_outputs[0]["checksum"] == pytest.approx(
        worker_outputs[1]["checksum"], rel=1e-12)


def test_process_local_shards_hold_disjoint_lanes(worker_outputs):
    lanes0 = set(worker_outputs[0]["local_lanes"])
    lanes1 = set(worker_outputs[1]["local_lanes"])
    assert lanes0 and lanes1
    assert not (lanes0 & lanes1), "shards overlap across processes"


def test_distributed_solution_matches_golden(worker_outputs):
    """Lane 0 is the SmallSystem golden scenario; whichever process owns
    that shard must deliver the reference control vector."""
    owners = [d for d in worker_outputs if d["control0"] is not None]
    assert len(owners) == 1, "exactly one process owns lane 0"
    np.testing.assert_allclose(np.asarray(owners[0]["control0"]),
                               GOLDEN_CONTROL, atol=2e-4)
