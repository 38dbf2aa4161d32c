from .timing import GLOBAL_TIMINGS, Stopwatch, TimingRegistry, device_trace

__all__ = ["GLOBAL_TIMINGS", "Stopwatch", "TimingRegistry", "device_trace"]
