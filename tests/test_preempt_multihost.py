"""Multi-host graceful preemption: SIGTERM to ONE process must stop ALL
processes at the SAME step (via the jax coordination service's preemption
sync point — utils/preemption.py). This is the property that keeps the
un-signalled hosts out of a dead collective when a pod host is reclaimed."""

import os
import signal
import socket
import subprocess
import sys
import textwrap
import time

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent("""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cstp_tpu.parallel import maybe_initialize_distributed
    assert maybe_initialize_distributed(), "env rendezvous not detected"
    from cstp_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard(enabled=True)
    assert guard._sync_service, "coordination preemption service expected"
    pid = jax.process_index()
    print(f"proc {pid} ready", flush=True)
    stopped_at = None
    for step in range(1, 4000):
        time.sleep(0.02)        # the per-step "work"
        if guard.requested(step):
            stopped_at = step
            break
    guard.close()
    print(f"proc {pid} stopped_at={stopped_at}", flush=True)
    sys.exit(0 if stopped_at is not None else 3)
""")


@pytest.mark.slow
def test_sigterm_on_one_host_stops_all_hosts_at_same_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "CSTP_COORDINATOR": f"127.0.0.1:{port}",
            "CSTP_NUM_PROCESSES": "2",
            "CSTP_PROCESS_ID": str(pid),
            "PYTHONPATH": os.path.dirname(os.path.dirname(__file__)),
        })
        env.pop("JAX_PLATFORMS", None)
        log = open(tmp_path / f"out{pid}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=log, stderr=subprocess.STDOUT, text=True))

    def _read(i):
        logs[i].flush()
        with open(tmp_path / f"out{i}.log") as f:
            return f.read()

    # wait for both workers to enter their step loops
    deadline = time.time() + 300
    while time.time() < deadline:
        if all("ready" in _read(i) for i in range(2)):
            break
        if any(p.poll() is not None for p in procs):
            raise AssertionError(
                f"worker died early:\n{_read(0)}\n{_read(1)}")
        time.sleep(0.5)
    else:
        for p in procs:
            p.kill()
        raise AssertionError(f"workers never ready:\n{_read(0)}\n{_read(1)}")

    time.sleep(1.0)  # let both make some steps
    os.kill(procs[0].pid, signal.SIGTERM)  # preempt host 0 ONLY

    for p in procs:
        p.wait(timeout=300)
    outs = [_read(i) for i in range(2)]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}:\n{out}"
    stops = [int(out.split("stopped_at=")[1].split()[0]) for out in outs]
    assert stops[0] == stops[1], f"hosts stopped at different steps: {stops}"
    assert stops[0] >= 1
    for log in logs:
        log.close()
