from .profiling import (timed_region, timed_function, event_summary,
                        print_event_summary, write_flamegraph,
                        reset_events, device_trace)
from .logging import (set_log_level, info, warning, error, debug, log,
                      info_red, info_blue, info_green,
                      DEBUG, INFO, WARNING, ERROR, CRITICAL)
from .parameters import parameters, Parameters

__all__ = [
    "timed_region", "timed_function", "event_summary",
    "print_event_summary", "write_flamegraph", "reset_events",
    "device_trace", "set_log_level", "info", "warning", "error", "debug",
    "log", "info_red", "info_blue", "info_green", "parameters",
    "Parameters", "DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL",
]
