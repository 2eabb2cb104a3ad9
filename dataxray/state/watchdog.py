"""Per-partition progress heartbeat + stall watchdog.

The reference flags tasks whose counters stop moving (TaskMonitor) and gives
each CDC shard a process timeout (OTSStreamReaderSlaveProxy.java:251-268).
Ray retries *failed* tasks by itself, but a silently WEDGED merge task (stuck
I/O, deadlocked native call) would stall an epoch forever with no signal.

Shape: merge tasks send fire-and-forget ``beat(partition, phase)`` calls to
a zero-CPU monitor actor; a daemon thread on the driver samples the actor
while the pipeline runs and records every partition that has been in-flight
longer than ``stall_timeout`` — surfaced in the RunReport (and the log) so
an operator or supervisor can act. Detection, not destruction: killing a
straggler is left to policy (the reference also only flags).
"""

from __future__ import annotations

import threading
import time


def _monitor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class ProgressMonitor:
        def __init__(self):
            self.started: dict[int, float] = {}
            self.done: dict[int, float] = {}

        def beat(self, partition: int, phase: str) -> None:
            now = time.monotonic()
            if phase == "start":
                self.started[partition] = now
            else:
                self.done[partition] = now

        def snapshot(self) -> tuple[dict, dict]:
            return dict(self.started), dict(self.done)

    return ProgressMonitor


class Watchdog:
    """Driver-side sampler: start() before the blocking pipeline call,
    stop() after; stalled() lists partitions seen in-flight too long."""

    def __init__(self, stall_timeout: float, poll_sec: float = 0.25):
        import ray

        self.timeout = stall_timeout
        self.poll = poll_sec
        self.monitor = _monitor_cls().remote()
        self._stalled: set[int] = set()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        import ray

        def run():
            while not self._stop.wait(self.poll):
                try:
                    started, done = ray.get(self.monitor.snapshot.remote(),
                                            timeout=5)
                except Exception:  # actor going away at shutdown
                    return
                now = time.monotonic()
                for p, t0 in started.items():
                    if p not in done and now - t0 > self.timeout \
                            and p not in self._stalled:
                        self._stalled.add(p)
                        print(f"[watchdog] partition {p} merge in-flight "
                              f"> {self.timeout}s — possible stall")

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        import ray

        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # terminate the zero-CPU monitor: long-lived tail sessions create one
        # Watchdog per epoch and leaked actors would accumulate unboundedly
        try:
            ray.kill(self.monitor, no_restart=True)
        except Exception:
            pass

    def stalled(self) -> list[int]:
        return sorted(self._stalled)
