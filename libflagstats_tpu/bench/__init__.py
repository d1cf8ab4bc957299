from .harness import BenchResult, measure_min, roofline_bytes_per_s  # noqa: F401
