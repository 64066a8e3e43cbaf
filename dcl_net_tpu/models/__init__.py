from dcl_net_tpu.models.blocks import (  # noqa: F401
    MaskedBatchNorm,
    SparseConvBlock,
    PointMLP,
)
from dcl_net_tpu.models.backbone import SparseBackbone, MultiScalePointFeatures  # noqa: F401
from dcl_net_tpu.models.dcl_net import DCLNet, dcl_losses, get_cano_label  # noqa: F401
from dcl_net_tpu.models.refiner import Refiner, refiner_losses  # noqa: F401
