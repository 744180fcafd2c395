"""Persistent device job runner for interactive perf work on the tunneled TPU.

The axon tunnel serializes process attach (50-190 s stalls between device
processes), which makes one-shot experiment scripts unusable. This server
attaches ONCE and then executes job files in-process, sharing a namespace
dict across jobs (imports, params, compiled programs persist).

Protocol: drop `NNN_name.py` into the watch dir; the server execs files in
lexicographic order, teeing stdout/stderr + traceback into `NNN_name.py.out`
and renaming the job to `.done`. Drop a file named `STOP` to exit cleanly.

Usage: python scripts/devserver.py [watch_dir]   (default ~/.svision_devjobs)
"""
import io
import os
import stat
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # Default to a user-owned 0700 dir: the server execs any *.py dropped in
    # the watch dir, so a predictable world-writable path (e.g. /tmp/devjobs)
    # would let any local user run code as the devserver user.
    watch = (sys.argv[1] if len(sys.argv) > 1
             else os.path.expanduser("~/.svision_devjobs"))
    os.makedirs(watch, mode=0o700, exist_ok=True)
    st = os.stat(watch)
    if st.st_uid != os.getuid() or st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
        sys.exit(f"[devserver] refusing {watch}: not owned by uid "
                 f"{os.getuid()} with group/other write cleared "
                 f"(mode {oct(st.st_mode & 0o777)}) — jobs in it would run "
                 "with this user's privileges")
    ns = {"__name__": "__devjob__"}
    print(f"[devserver] watching {watch}", flush=True)
    while True:
        if os.path.exists(os.path.join(watch, "STOP")):
            os.remove(os.path.join(watch, "STOP"))
            print("[devserver] STOP", flush=True)
            return
        jobs = sorted(f for f in os.listdir(watch)
                      if f.endswith(".py") and not f.endswith(".done.py"))
        if not jobs:
            time.sleep(0.5)
            continue
        job = os.path.join(watch, jobs[0])
        out_path = job + ".out"
        print(f"[devserver] running {jobs[0]}", flush=True)
        buf = io.StringIO()
        real_out, real_err = sys.stdout, sys.stderr

        class Tee:
            def __init__(self, a, b):
                self.a, self.b = a, b

            def write(self, s):
                self.a.write(s)
                self.b.write(s)

            def flush(self):
                self.a.flush()
                self.b.flush()

            def close(self):  # absl's atexit handler closes sys.stderr
                self.flush()

        sys.stdout = sys.stderr = Tee(buf, real_out)
        t0 = time.time()
        try:
            with open(job) as fh:
                code = fh.read()
            exec(compile(code, job, "exec"), ns)
            status = "ok"
        except BaseException:
            traceback.print_exc()
            status = "error"
        finally:
            sys.stdout, sys.stderr = real_out, real_err
        with open(out_path, "w") as fh:
            fh.write(buf.getvalue())
            fh.write(f"\n[devserver] {status} in {time.time()-t0:.1f}s\n")
        os.rename(job, job[:-3] + ".done.py")


if __name__ == "__main__":
    main()
