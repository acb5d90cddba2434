from .repro_sum import repro_sum, repro_sum_host  # noqa: F401
