from genarchbench_tpu.harness.scheduler import (  # noqa: F401
    Job, JobResult, JobRunner, detect_scheduler, read_energy_j)
