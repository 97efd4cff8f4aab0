"""UX utilities: progress bar + citation registry (reference:
firedrake/progress_bar.py, firedrake/citations.py)."""
from __future__ import annotations

import sys
import time


class ProgressBar:
    """Minimal timestep progress bar: `for t in ProgressBar("time").iter(
    timesteps): ...` (reference: firedrake/progress_bar.py)."""

    def __init__(self, label="progress", width=40, stream=sys.stderr):
        self.label = label
        self.width = width
        self.stream = stream

    def iter(self, iterable):
        items = list(iterable)
        n = max(len(items), 1)
        t0 = time.time()
        for i, item in enumerate(items):
            frac = (i + 1) / n
            filled = int(self.width * frac)
            bar = "#" * filled + "-" * (self.width - filled)
            el = time.time() - t0
            self.stream.write(f"\r{self.label} [{bar}] "
                              f"{frac * 100:5.1f}% ({el:.1f}s)")
            self.stream.flush()
            yield item
        self.stream.write("\n")


class Citations(dict):
    """Citation registry printed on request (reference:
    firedrake/citations.py petsctools.cite)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def register(self, key):
        self._registered = getattr(self, "_registered", set())
        self._registered.add(key)

    def print_at_exit(self):
        import atexit
        atexit.register(self._print)

    def _print(self):
        for key in sorted(getattr(self, "_registered", ())):
            entry = self.get(key)
            if entry:
                print(entry)


Citations()["firedrake_tpu"] = """@misc{firedrake_tpu,
  title = {firedrake\\_tpu: a TPU-native finite element framework},
  note = {Rebuild of Firedrake's capabilities on JAX/XLA/Pallas},
  year = {2026},
}"""
