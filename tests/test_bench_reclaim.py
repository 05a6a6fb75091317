"""bench.py chip-reclaim logic (round 5): the driver's bench run must be
able to take the TPU back from a still-running campaign queue, but a
bench invoked FROM a queue must never kill sibling queues, and merely
importing bench must never kill anything (this test file imports it)."""

import os
import signal
import subprocess
import time
from pathlib import Path


def _spawn_tree(tmp_path):
    """bash parent that sleeps via a child — a miniature queue tree."""
    script = tmp_path / "fake_queue.sh"
    script.write_text("#!/bin/bash\nsleep 600 &\nwait\n")
    proc = subprocess.Popen(["bash", str(script)])
    time.sleep(0.3)
    return proc


def test_reclaims_foreign_queue_tree(tmp_path):
    import bench

    proc = _spawn_tree(tmp_path)
    pidfile = tmp_path / "fakeq_1.pid"
    pidfile.write_text(str(proc.pid))
    victims = bench._release_chip(pid_glob=str(tmp_path / "fakeq_*.pid"))
    assert victims == [proc.pid]
    # parent and its sleep child are gone
    assert proc.wait(timeout=5) != 0
    time.sleep(0.2)
    assert not Path(f"/proc/{proc.pid}").exists()


def test_skips_when_invoked_from_a_queue(tmp_path):
    """A queue pid among our ancestors disables reclaim entirely —
    sibling queues survive."""
    import bench

    sibling = _spawn_tree(tmp_path)
    (tmp_path / "fakeq_sib.pid").write_text(str(sibling.pid))
    # our own ancestor (this pytest process) registered as a queue pid
    (tmp_path / "fakeq_self.pid").write_text(str(os.getpid()))
    try:
        victims = bench._release_chip(pid_glob=str(tmp_path / "fakeq_*.pid"))
        assert victims == []
        assert sibling.poll() is None  # untouched
    finally:
        os.kill(sibling.pid, signal.SIGKILL)
        sibling.wait()


def test_dead_pidfile_is_ignored(tmp_path):
    import bench

    (tmp_path / "fakeq_dead.pid").write_text("999999")
    assert bench._release_chip(pid_glob=str(tmp_path / "fakeq_*.pid")) == []
