"""Runtime services: profiling, preemption-safe checkpointing, multi-host.

The reference has none of these (SURVEY §5.1-5.3): its only profiling is a
wall-clock meter plus an always-on `torch.autograd.set_detect_anomaly`
(reference main.py:499 — a debug tracer slowing every run, deliberately not
replicated), and its only failure handling is a NaN abort.  TPU pods
preempt, so SIGTERM-triggered checkpointing is first-class here.
"""
from __future__ import annotations

import os
import signal
from contextlib import contextmanager
from typing import Optional

import jax


@contextmanager
def profile_steps(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None.

    View with TensorBoard's profile plugin or xprof.
    """
    if log_dir is None:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PreemptionGuard:
    """SIGTERM/SIGINT-aware flag for checkpoint-on-preemption.

    Usage: guard = PreemptionGuard(); inside the epoch loop, check
    `guard.should_stop` and save + exit cleanly.  TPU pod preemptions
    deliver SIGTERM with a grace window.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self.should_stop = False
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handler(self, signum, frame):
        self.should_stop = True

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Initialize jax.distributed for multi-host data parallelism.

    The GSPMD mesh then spans all hosts' devices; the reference's analogue
    is the NCCL process-group init (reference utils/dist.py:51-64,
    main.py:405-411), but here there is ONE python process per host and no
    explicit collectives in user code.
    No-op when JAX already runs multi-process or env vars configure it.
    """
    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(**kwargs)
