from avsl_tpu.core.config import (  # noqa: F401
    load_yaml_config,
    save_yaml_config,
    merge_configs,
    dict_to_namespace,
    namespace_to_dict,
    get_default_config,
    parse_args_with_config,
    AVHuBERTConfig,
    WhisperConfig,
    FlamingoTrainConfig,
)
from avsl_tpu.core.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from avsl_tpu.core.partitioning import (  # noqa: F401
    state_shardings,
    shard_state,
    describe_shardings,
)
from avsl_tpu.core.pipeline import (  # noqa: F401
    make_pp_mesh,
    pipeline_apply,
    stack_block_params,
    unstack_block_params,
)
