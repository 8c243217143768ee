#!/usr/bin/env python
"""TPU job supervisor.

Compile requests through the axon tunnel are occasionally dropped
server-side (typically after an earlier client was killed mid-compile); the
client then blocks forever — jax has no client-side timeout.  So each job
runs in a FRESH subprocess under a watchdog: on timeout the subprocess is
killed (by exact PID) and the job retried; retries almost always succeed
because the service itself stays healthy.

Protocol: drop `<name>.py` files into the jobs dir; they run in sorted
order with stdout+stderr streaming to `<name>.out`; the job file is renamed
`<name>.done` (or `.fail`) when finished.  Drop a file named `quit` to stop.
Jobs must be self-contained scripts (fresh interpreter each time; the
persistent compilation cache in .jax_cache keeps recompiles cheap).

Usage:  python tools/tpu_worker.py /tmp/tpujobs [timeout_s] [retries] &
"""

import os
import signal
import subprocess
import sys
import time

JOBS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpujobs"
TIMEOUT = int(sys.argv[2]) if len(sys.argv) > 2 else 900
RETRIES = int(sys.argv[3]) if len(sys.argv) > 3 else 2
os.makedirs(JOBS, exist_ok=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

print(f"[supervisor] ready, jobs={JOBS} timeout={TIMEOUT}s", flush=True)
with open(os.path.join(JOBS, "READY"), "w") as f:
    f.write("ok")

while True:
    if os.path.exists(os.path.join(JOBS, "quit")):
        print("[supervisor] quit", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    out_path = os.path.join(JOBS, name[:-3] + ".out")
    status = "FAIL"
    for attempt in range(RETRIES + 1):
        print(f"[supervisor] {name} attempt {attempt}", flush=True)
        with open(out_path, "a") as out:
            out.write(f"--- attempt {attempt} ---\n")
            out.flush()
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            proc = subprocess.Popen(
                [sys.executable, path], stdout=out, stderr=subprocess.STDOUT,
                env=env, cwd=REPO, start_new_session=True,
            )
            try:
                rc = proc.wait(timeout=TIMEOUT)
                status = "OK" if rc == 0 else f"EXIT {rc}"
                break
            except subprocess.TimeoutExpired:
                # kill the exact process group we started
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except OSError:
                    proc.kill()
                proc.wait()
                out.write(f"\n[watchdog: killed after {TIMEOUT}s]\n")
                status = "TIMEOUT"
        if status == "TIMEOUT":
            time.sleep(10)  # brief cool-down before the retry
    with open(out_path, "a") as out:
        out.write(f"\n[{status}]\n")
    os.rename(path, path[:-3] + (".done" if status == "OK" else ".fail"))
    print(f"[supervisor] {name}: {status}", flush=True)
