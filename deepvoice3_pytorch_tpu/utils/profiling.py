# coding: utf-8
"""Tracing/profiling hooks — an auxiliary subsystem the reference lacks
entirely (SURVEY §5.1: only tqdm bars, no tracing; reference train.py:623).

Two pieces:
  * StepTimer — wall-clock per-step timing with warmup skip (first steps are
    compile-dominated) and rolling throughput, for stdout + tensorboard.
  * TraceWindow — wraps jax.profiler.start_trace/stop_trace around a step
    range; the dump is viewable in TensorBoard's profile plugin / Perfetto.
"""

import time

import jax


def rss_mb(default=float("nan")):
    """Resident-set size of this process in MiB (Linux /proc).

    Shared by the serving soak test and the soak bench row so the two
    can't drift; returns `default` when VmRSS is unavailable (non-Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return default


class StepTimer:
    """Rolling per-step timing; call tick() once per optimizer step."""

    def __init__(self, warmup=2, window=50):
        self.warmup = warmup
        self.window = window
        self._count = 0
        self._t_last = None
        self._times = []

    def tick(self):
        now = time.perf_counter()
        self._count += 1
        if self._t_last is not None and self._count > self.warmup:
            self._times.append(now - self._t_last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._t_last = now

    @property
    def seconds_per_step(self):
        if not self._times:
            return float("nan")
        return sum(self._times) / len(self._times)

    @property
    def steps_per_second(self):
        s = self.seconds_per_step
        return 1.0 / s if s == s and s > 0 else float("nan")

    def report(self, writer=None, step=None):
        if not self._times:
            return ""
        if writer is not None and step is not None:
            writer.add_scalar("perf/steps_per_sec", self.steps_per_second,
                              step)
            writer.add_scalar("perf/sec_per_step", self.seconds_per_step,
                              step)
        return "%.2f steps/s (%.0f ms/step)" % (
            self.steps_per_second, self.seconds_per_step * 1000.0)


class TraceWindow:
    """Capture a jax.profiler trace over steps [start, start+num)."""

    def __init__(self, log_dir, start_step, num_steps=5):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def maybe_start(self, step):
        if self.log_dir and not self._active and step == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            print("profiler: tracing steps %d..%d -> %s"
                  % (self.start, self.stop - 1, self.log_dir))

    def maybe_stop(self, step):
        if self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            print("profiler: trace written to %s" % self.log_dir)

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
