from avsl_tpu.models.layers import (  # noqa: F401
    MultiHeadAttention,
    TransformerBlock,
    sinusoid_embedding,
    grad_multiply,
    init_self_attn_cache,
)
from avsl_tpu.models.whisper import Whisper, WhisperEncoder, WhisperTextDecoder  # noqa: F401
from avsl_tpu.models.resnet3d import ResNet3DFrontend  # noqa: F401
from avsl_tpu.models.avhubert import (  # noqa: F401
    AVHuBERTModel,
    AVHuBERTEncoderWrapper,
    AVHuBERTForCTC,
    AVHuBERTForSpeech2Text,
)
from avsl_tpu.models.pretrain import (  # noqa: F401
    AVHuBERTForPretraining,
    pretrain_loss,
)
from avsl_tpu.models.moe import (  # noqa: F401
    MoEFFN,
    make_ep_mesh,
    moe_aux_loss,
)
from avsl_tpu.models.quant import (  # noqa: F401
    QTensor,
    quantize_tree,
    dequantize_tree,
    quantization_report,
    quantize_rows,
    quantize_kv_cache,
)
from avsl_tpu.models.lora import (  # noqa: F401
    init_lora,
    merge_lora,
    lora_loss_fn,
    lora_summary,
)
