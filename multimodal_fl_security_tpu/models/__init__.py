"""Model zoo: image CNNs, ResNet, and multimodal fusion encoders.

All models are flax.linen modules with a uniform interface::

    logits = model.apply(variables, batch, train=bool, rngs={"dropout": key})

where ``batch`` is a dict of modality arrays (``image`` [B,H,W,C] NHWC,
``attributes`` [B,A], ``audio`` [B,F,T,1], ``text`` [B,L] int32,
``video`` [B,T,H,W,C]) plus ``label`` [B]. NHWC layout and bf16-friendly
matmul shapes are chosen for the TPU MXU.

Registry names mirror the reference factories
(reference: src/models/simple_cnn.py:90-102, src/models/cub200_cnn.py:121-132)
plus the multimodal families from BASELINE.json configs.
"""

from multimodal_fl_security_tpu.models.registry import (  # noqa: F401
    MODELS,
    create_model,
    init_model,
)
from multimodal_fl_security_tpu.models.simple_cnn import SimpleCNN  # noqa: F401
from multimodal_fl_security_tpu.models.multimodal import MultimodalFusionCNN  # noqa: F401
from multimodal_fl_security_tpu.models.resnet import ResNet  # noqa: F401
from multimodal_fl_security_tpu.models.fusion import (  # noqa: F401
    AVMnistFusion,
    ClipStyleClassifier,
    CremadFusion,
)
