from avdn_tpu.utils.logging import (
    write_to_record_file,
    time_since,
    PhaseTimer,
    MetricWriter,
    print_progress,
)
from avdn_tpu.utils.seed import set_random_seed
from avdn_tpu.utils.profiling import profile_trace
from avdn_tpu.utils.debug import device_memory_census, format_memory_census

__all__ = [
    "write_to_record_file",
    "time_since",
    "PhaseTimer",
    "MetricWriter",
    "print_progress",
    "set_random_seed",
    "profile_trace",
    "device_memory_census",
    "format_memory_census",
]
