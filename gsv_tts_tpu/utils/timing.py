"""Lightweight timing spans and first-class latency counters.

The reference has no formal tracing (SURVEY §5: tqdm bars + WebUI RTF
readout); here spans and counters are first-class: ``span()`` context
managers feed per-name reservoirs with p50/p95 summaries, and
``jax_profile()`` wraps ``jax.profiler`` traces for TPU work.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class Timings:
    """Per-name rolling latency reservoirs."""

    def __init__(self, window: int = 256):
        self._window = window
        self._data: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    def record(self, name: str, seconds: float):
        self._data[name].append(seconds)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._data.items():
            if not vals:
                continue
            s = sorted(vals)
            n = len(s)
            out[name] = {
                "count": n,
                "p50": s[n // 2],
                "p95": s[min(n - 1, int(n * 0.95))],
                "mean": sum(s) / n,
                "last": vals[-1],
            }
        return out


# process-wide default instance
timings = Timings()


@contextlib.contextmanager
def jax_profile(logdir: Optional[str] = None):
    """Wrap a block in a jax.profiler trace (viewable in TensorBoard /
    xprof).  No-ops cleanly if profiling is unsupported on the platform."""
    import jax

    if logdir is None:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class RTFMeter:
    """Real-time-factor meter: synth seconds vs wall seconds (the reference's
    WebUI readout, ``WebUI/web.py:355-362``)."""

    def __init__(self):
        self.wall = 0.0
        self.audio = 0.0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.wall += time.perf_counter() - t0

    def add_audio(self, seconds: float):
        self.audio += seconds

    @property
    def rtf(self) -> float:
        return self.wall / self.audio if self.audio else float("inf")


def _host_cache_key() -> str:
    """Fingerprint of the host CPU feature set + jaxlib version.  XLA:CPU
    AOT cache entries compiled on a DIFFERENT machine load with
    machine-feature mismatches — the loader warns 'could lead to execution
    errors such as SIGILL', and one mid-suite ``Fatal Python error:
    Aborted`` inside ``device_get`` was traced to a cache shared across
    boxes.  Keying the cache directory per host makes foreign entries
    unreachable instead of fatal."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.processor() or platform.machine()
    try:
        import jaxlib

        feats += " jaxlib=" + jaxlib.__version__
    except Exception:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache so repeated bench/driver
    runs skip recompiles (especially valuable over tunneled TPU sessions).
    The given ``path`` gets a per-host suffix (see :func:`_host_cache_key`)."""
    import os

    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "gsv_jax_cache")
    path = os.path.join(path, _host_cache_key())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def percentile(xs, q: float):
    """Nearest-rank percentile over the non-None values (None when empty).
    Shared by the saturation harnesses (tools/saturation.py and
    bench.py --saturation) so 'the same metric' cannot silently diverge
    between their artifacts."""
    xs = sorted(x for x in xs if x is not None)
    if not xs:
        return None
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]
