"""Multi-host backend: 2 processes x 4 virtual CPU devices each.

SURVEY §2.5/§5 requires hosts + DCN, not just one process's chips.  The
CI-runnable equivalent: two OS processes joined through
``jax.distributed`` (Gloo collectives over loopback), running the same
sharded setup + solve as ``tests/test_parallel.py`` and asserting the
same bit-identical-labels / iteration-parity contracts — see
``tests/multihost_worker.py`` for the per-rank assertions.
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_setup_and_solve_parity():
    # bounded by communicate(timeout=540) below — pytest-timeout is not
    # installed, so a mark would be inert (PytestUnknownMarkWarning)
    port = _free_port()
    env = dict(os.environ)
    # the session may pre-wire a tunneled TPU through sitecustomize;
    # the workers must come up as plain multi-process CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = f"{REPO}:{HERE}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
    oks = [line for out in outs for line in out.splitlines()
           if line.startswith("MULTIHOST-OK")]
    assert len(oks) == 2, outs
    assert oks[0] == oks[1], oks      # identical checksum + iterations
