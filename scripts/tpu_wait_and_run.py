"""Poll until the tunneled TPU backend initializes, then run the
TPU-return orchestrator (scripts/tpu_return_runner.py). Probes run in a
subprocess under a timeout so a hung backend init never wedges the
watcher. Appends to tpu_wait_log.txt."""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
LOG = os.path.join(HERE, "tpu_wait_log.txt")

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((8, 128));"
    "print('PROBE_OK', float(jax.device_get((x @ x.T).sum())), flush=True)"
)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else None
    attempt = 0
    while deadline is None or time.time() < deadline:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE],
                capture_output=True, text=True, timeout=420,
            )
            ok = "PROBE_OK" in out.stdout
        except subprocess.TimeoutExpired:
            ok, out = False, None
        if ok:
            log(f"probe {attempt}: TPU is back — launching runner")
            subprocess.run(
                [sys.executable, os.path.join(HERE, "tpu_return_runner.py")],
                check=False,
            )
            log("runner finished")
            return 0
        tail = (out.stderr.strip().splitlines()[-1][:120]
                if out and out.stderr.strip() else "probe timeout")
        log(f"probe {attempt}: down ({tail}); retrying in 120 s")
        time.sleep(120)
    log("deadline reached, TPU never came back")
    return 1


if __name__ == "__main__":
    sys.exit(main())
