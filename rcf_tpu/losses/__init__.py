from .common_fate import (  # noqa: F401
    common_fate_loss,
    demean_affine_flow,
    norm_and_clamp_flow,
    residual_adjustment,
)
from .regularizers import (  # noqa: F401
    compactness_loss,
    entropy_loss,
    object_aware_sharpen_loss,
    pseudo_label_loss,
    sharpen,
    sharpen_loss,
)
