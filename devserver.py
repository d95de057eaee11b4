"""Persistent dev worker: reads python code chunks from a FIFO, executes them
with jax kept warm, appends output to a log. Used only for development
iteration (fresh-process jax import costs minutes on this host)."""
import io
import os
import sys
import traceback

FIFO = os.environ.get("DEVLOOP_FIFO", "/tmp/devloop.fifo")
LOG = os.environ.get("DEVLOOP_LOG", "/tmp/devloop.log")

if os.path.exists(FIFO):
    os.remove(FIFO)
os.mkfifo(FIFO)

sys.path.insert(0, "/root/repo")
import devloop  # noqa: E402  (sets env before jax import)
import jax      # noqa: E402

ns = {"rl": devloop.rl, "t": devloop.t, "jax": jax, "os": os, "sys": sys}

with open(LOG, "a") as lg:
    lg.write(f"== devserver ready: {jax.devices()} ==\n")
    lg.flush()

n = 0
while True:
    with open(FIFO, "r") as f:
        code = f.read()
    if not code.strip():
        continue
    if code.strip() == "exit":
        break
    n += 1
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = buf
    try:
        exec(compile(code, "<devloop>", "exec"), ns)
        status = "OK"
    except SystemExit as e:
        status = f"EXIT({e.code})"
    except Exception:
        traceback.print_exc()
        status = "ERROR"
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    with open(LOG, "a") as lg:
        lg.write(buf.getvalue())
        lg.write(f"\n==DONE {n} {status}==\n")
        lg.flush()
