"""Heartbeat + watchdog (rcf_tpu/utils/watchdog.py): liveness semantics and
the supervise() kill/retry contract. No TPU, no jax — the watchdog must stay
importable and correct in a plain host process (it supervises the process
that owns the relay client, so it can never share that client)."""

import os
import subprocess
import sys
import time

from rcf_tpu.utils.watchdog import (
    COMPILE_GRACE_S,
    DEFAULT_GRACE_S,
    Heartbeat,
    is_stalled,
    read_heartbeat,
    supervise,
)


def test_heartbeat_roundtrip(tmp_path):
    hb = Heartbeat(str(tmp_path))
    hb.beat()
    t, grace = read_heartbeat(hb.path, not_before=0.0)
    assert grace == DEFAULT_GRACE_S
    assert abs(t - time.time()) < 5.0

    hb.beat(COMPILE_GRACE_S)
    _, grace = read_heartbeat(hb.path, not_before=0.0)
    assert grace == COMPILE_GRACE_S


def test_heartbeat_disabled_is_noop(tmp_path):
    Heartbeat(None).beat()  # must not raise
    hb = Heartbeat(str(tmp_path), enabled=False)
    hb.beat()
    assert not os.path.exists(hb.path)


def test_missing_or_stale_file_gets_startup_grace(tmp_path):
    path = str(tmp_path / ".heartbeat")
    start = time.time()
    # Missing: child is in its startup+first-compile window.
    t, grace = read_heartbeat(path, not_before=start)
    assert (t, grace) == (start, COMPILE_GRACE_S)
    assert not is_stalled(path, start, now=start + COMPILE_GRACE_S - 1)
    assert is_stalled(path, start, now=start + COMPILE_GRACE_S + 1)

    # Stale file from a PREVIOUS run (mtime < process start): same treatment
    # — its old grace must not apply to the new child.
    Heartbeat(str(tmp_path)).beat(grace=1.0)
    later = time.time() + 60.0
    t, grace = read_heartbeat(path, not_before=later)
    assert (t, grace) == (later, COMPILE_GRACE_S)


def test_corrupt_file_degrades_to_startup_grace(tmp_path):
    path = str(tmp_path / ".heartbeat")
    with open(path, "w") as f:
        f.write("not-a-number")
    start = os.path.getmtime(path) - 1.0
    t, grace = read_heartbeat(path, not_before=start)
    assert grace == COMPILE_GRACE_S


def test_fresh_beat_with_default_grace(tmp_path):
    hb = Heartbeat(str(tmp_path))
    start = time.time() - 10.0
    hb.beat()
    assert not is_stalled(hb.path, start)
    # A beat promising only 0s of silence: anything after it is stalled.
    hb.beat(grace=0.0)
    time.sleep(0.05)
    assert is_stalled(hb.path, start)


def test_supervise_healthy_child_passes_through_rc(tmp_path):
    log = str(tmp_path / "log")
    rc, stalled = supervise([sys.executable, "-c", "raise SystemExit(7)"],
                            str(tmp_path / ".heartbeat"), log, poll_s=0.1)
    assert (rc, stalled) == (7, False)


def test_supervise_kills_stalled_child(tmp_path):
    hb_path = str(tmp_path / ".heartbeat")
    log = str(tmp_path / "log")
    # Child beats once with a tiny grace, then hangs forever (the dropped-
    # RPC shape). The watchdog must kill it shortly after the grace expires.
    child = (
        "import sys, time;"
        "sys.path.insert(0, %r);"
        "from rcf_tpu.utils.watchdog import Heartbeat;"
        "hb = Heartbeat(%r); hb.beat(grace=0.5);"
        "print('beaten', flush=True); time.sleep(600)"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), str(tmp_path))
    t0 = time.time()
    rc, stalled = supervise([sys.executable, "-c", child], hb_path, log, poll_s=0.1)
    assert (rc, stalled) == (None, True)
    assert time.time() - t0 < 60.0  # killed on the grace, not the 600s sleep
    with open(log) as f:
        assert "beaten" in f.read()


def test_supervise_timeout_kills_even_with_live_heartbeat(tmp_path):
    hb_dir = str(tmp_path)
    hb_path = os.path.join(hb_dir, ".heartbeat")
    Heartbeat(hb_dir).beat(grace=9999.0)
    child = "import time\nwhile True: time.sleep(0.1)"
    rc, stalled = supervise([sys.executable, "-c", child], hb_path,
                            str(tmp_path / "log"), poll_s=0.1, timeout_s=1.0)
    assert (rc, stalled) == (None, True)


def test_supervise_never_deadlocks_on_chatty_child(tmp_path):
    # Output goes to a file, not a pipe: a child writing >64KiB (a pipe
    # buffer) must still exit cleanly.
    child = "import sys\nsys.stdout.write('x' * 300000)\n"
    rc, stalled = supervise([sys.executable, "-c", child],
                            str(tmp_path / ".heartbeat"),
                            str(tmp_path / "log"), poll_s=0.1)
    assert (rc, stalled) == (0, False)
    assert os.path.getsize(tmp_path / "log") == 300000


def test_per_host_heartbeat_files_and_any_host_stall(tmp_path):
    """Multi-host attribution (VERDICT r4 weak 5): process i>0 writes its own
    .heartbeat.h<i>, and a stall on ANY host trips the monitor even while
    process 0 keeps beating."""
    start = time.time() - 5.0
    hb0 = Heartbeat(str(tmp_path), host=0)
    hb1 = Heartbeat(str(tmp_path), host=1)
    assert hb0.path.endswith(".heartbeat")
    assert hb1.path.endswith(".heartbeat.h1")
    hb0.beat()
    hb1.beat()
    assert not is_stalled(hb0.path, start)
    # Host 1 goes quiet past its grace; host 0 still beats.
    hb1.beat(grace=0.0)
    time.sleep(0.05)
    hb0.beat()
    assert is_stalled(hb0.path, start)


def test_stale_sibling_from_previous_run_is_ignored(tmp_path):
    hb0 = Heartbeat(str(tmp_path), host=0)
    hb1 = Heartbeat(str(tmp_path), host=1)
    hb1.beat(grace=0.0)  # previous run's host-1 file, long out of grace
    time.sleep(0.05)
    start = time.time()  # new run starts AFTER that file's mtime
    hb0.beat()
    assert not is_stalled(hb0.path, start)


def test_beat_scratch_file_not_seen_as_host_file(tmp_path):
    """The rename scratch must not match the .heartbeat* monitor glob."""
    hb1 = Heartbeat(str(tmp_path), host=1)
    hb1.beat()
    names = sorted(os.listdir(tmp_path))
    assert names == [".heartbeat.h1"], names


def test_supervise_kills_when_nonzero_host_stalls(tmp_path):
    """Integration shape of VERDICT r4 #7: a real supervised child whose
    'process 0' keeps beating while its 'process 1' beat file goes silent —
    the monitor must kill on host 1's stall, not wait for host 0."""
    hb_path = str(tmp_path / ".heartbeat")
    child = (
        "import sys, time, threading;"
        "sys.path.insert(0, %r);"
        "from rcf_tpu.utils.watchdog import Heartbeat;"
        "hb0 = Heartbeat(%r, host=0); hb1 = Heartbeat(%r, host=1);"
        "hb1.beat(grace=0.5);"  # host 1 beats once, then hangs
        "threading.Thread(target=lambda: [hb0.beat(60.0) or time.sleep(0.2)"
        " for _ in range(3000)], daemon=True).start();"
        "print('beaten', flush=True); time.sleep(600)"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         str(tmp_path), str(tmp_path))
    t0 = time.time()
    rc, stalled = supervise([sys.executable, "-c", child], hb_path,
                            str(tmp_path / "log"), poll_s=0.1)
    assert (rc, stalled) == (None, True)
    assert time.time() - t0 < 60.0  # killed on host-1's grace, not the sleep
