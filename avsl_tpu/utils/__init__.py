from avsl_tpu.utils.paths import (  # noqa: F401
    project_root,
    ensure_dir,
    check_writable,
    get_checkpoint_path,
    get_log_path,
    disk_usage_report,
    log_disk_space,
)
from avsl_tpu.utils.memory import (  # noqa: F401
    get_memory_stats,
    log_memory_stats,
    estimate_model_memory,
    memory_aware_batch_size,
    profile_trace,
)
