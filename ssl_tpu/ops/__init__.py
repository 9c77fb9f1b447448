from ssl_tpu.ops.ssg import (  # noqa: F401
    SSGConfig,
    apply_mask_stride,
    mask_to_positions,
    reflect_pad_2d,
    ssg_from_mask,
    ssg_matrix,
)
