from .lib import (  # noqa: F401
    decode_mflo,
    encode_mflo,
    flow_warp_map,
    get_consistency_map,
    preprocess_optical_flow,
)
from .models import get_flow_model  # noqa: F401
from .viz import flow_to_image, read_flo, write_flo  # noqa: F401
