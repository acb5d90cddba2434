"""Multi-process (multi-host analog) runtime: 2 real JAX processes over
gloo vs 1 process, same 8-device mesh — results and restart-resume must be
bitwise identical (parallel_mod.F90:100 initmp; README:46-48 BFB).

Runs scripts/mh_worker.py in subprocesses (the distributed runtime cannot
be initialized inside the pytest process)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
WORKER = os.path.join(ROOT, "scripts", "mh_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc, port, outdir, mode):
    env = dict(os.environ, PYTHONPATH=ROOT)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         outdir, mode], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in range(nproc)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    return outs


@pytest.mark.filterwarnings("ignore")
def test_two_process_bitwise_and_resume(tmp_path):
    d1 = tmp_path / "p1"
    d2 = tmp_path / "p2"
    d1.mkdir()
    d2.mkdir()
    # 1 process x 8 devices: reference trajectory
    _launch(1, _free_port(), str(d1), "run")
    # 2 processes x 4 devices: same mesh size
    _launch(2, _free_port(), str(d2), "run")
    f1 = np.load(d1 / "final.npy")
    f2 = np.load(d2 / "final.npy")
    assert np.array_equal(f1, f2), "process-count changed the bits"
    # resume the 1-process run's mid-state under 2 processes: the
    # continuation must land exactly on the 1-process final state
    (d2 / "mid.npy").write_bytes((d1 / "mid.npy").read_bytes())
    _launch(2, _free_port(), str(d2), "resume")
    f2r = np.load(d2 / "final2.npy")
    assert np.array_equal(f1, f2r), "cross-process-count resume not exact"
